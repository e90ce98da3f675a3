package graft.functions

import org.apache.spark.sql.{Column, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` surface — the user-defined-aggregate extension
  * point (SURVEY §7 custom-Catalyst inventory). The vector sum is the
  * centroid-building primitive (class prototypes, IVF codebook
  * refinement — the batch analog of the reference's per-layer
  * activation accumulation, /root/reference/simulator/sim_reflex.py:89):
  * ONE distributed aggregate with map-side partial merge, O(dim)
  * state per group — never a collect of group members. */
object VecAggregates {

  /** Element-wise sum of `array<float>` vectors in double precision.
    * Null inputs are skipped; the empty buffer is the identity so
    * partial merges from empty partitions are safe. All vectors in a
    * group must share a dimension. */
  class VecSumAgg extends Aggregator[Seq[Float], Array[Double], Seq[Double]] {
    override def zero: Array[Double] = Array.emptyDoubleArray

    override def reduce(b: Array[Double], a: Seq[Float]): Array[Double] =
      if (a == null) b
      else {
        val out = if (b.isEmpty) new Array[Double](a.length) else b
        require(out.length == a.length,
          s"vec_sum_agg: dim mismatch ${out.length} vs ${a.length}")
        var i = 0
        while (i < out.length) { out(i) += a(i); i += 1 }
        out
      }

    override def merge(x: Array[Double], y: Array[Double]): Array[Double] =
      if (x.isEmpty) y
      else if (y.isEmpty) x
      else {
        require(x.length == y.length,
          s"vec_sum_agg: dim mismatch ${x.length} vs ${y.length}")
        var i = 0
        while (i < x.length) { x(i) += y(i); i += 1 }
        x
      }

    override def finish(r: Array[Double]): Seq[Double] = r.toSeq

    override def bufferEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  private val vecSumUdaf =
    udaf(new VecSumAgg, ExpressionEncoder[Seq[Float]]())

  /** Column-API spelling: `vecSumAgg(col("embedding"))`. */
  def vecSumAgg(v: Column): Column = vecSumUdaf(v)

  /** SQL registration: `SELECT label, vec_sum_agg(embedding) ...`.
    * (UDAFs register through spark.udf, not the expression-builder
    * registry GraftFunctions uses for scalar kernels.) */
  def register(spark: SparkSession): Unit =
    spark.udf.register("vec_sum_agg", vecSumUdaf)
}
