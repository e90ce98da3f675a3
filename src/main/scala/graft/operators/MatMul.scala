package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Distributed matrix multiply — the relational spelling of the
  * reference's CIM_MatMul (/root/reference/imc22_sdk/imc22_cim.c:87-142)
  * and the GEMV fully-connected layer
  * (/root/reference/simulator/sim_reflex.py:43-91).
  *
  * Matrices are coordinate tables `(i, j, v)`; the product A(m×k) ·
  * B(k×n) is a join on the inner dimension + group-sum:
  *
  *   C(i, j) = Σ_k A(i,k) · B(k,j)
  *
  * Scale shape: one shuffle of each operand on the inner dim, one
  * shuffle of the products on (i, j) with map-side partial sums. If
  * one operand is small (a weight matrix — the reference's case,
  * weights ≤ 512 KB, DATASHEET §6) it broadcasts and the whole GEMM
  * is a single narrow stage; `gemv` takes the broadcast path
  * explicitly. */
object MatMul {

  /** Coordinate-form GEMM: a(i,k,v) ⋈ b(k,j,v) → c(i,j,v). */
  def coo(a: DataFrame, b: DataFrame): DataFrame =
    a.toDF("i", "k", "va").join(b.toDF("k", "j", "vb"), Seq("k"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("va") * col("vb")).as("v"))

  /** GEMM with a broadcast right operand (weights). */
  def cooBroadcast(a: DataFrame, b: DataFrame): DataFrame =
    a.toDF("i", "k", "va").join(broadcast(b.toDF("k", "j", "vb")), Seq("k"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("va") * col("vb")).as("v"))

  /** Sparse GEMM (ref threshold-skip,
    * /root/reference/imc22_sdk/python/imc22.py:507-530): zero-ish
    * entries are filtered BEFORE the join — sparsity as predicate
    * pushdown, the relational form of MAC skipping. */
  def cooSparse(a: DataFrame, b: DataFrame, threshold: Double): DataFrame =
    coo(a.toDF("i", "k", "v").filter(abs(col("v")) >= threshold),
      b.toDF("k", "j", "v").filter(abs(col("v")) >= threshold))

  /** Batched GEMV over a vector column: y = W·x + bias (+ReLU) per
    * row, W broadcast as literal arrays — the FC layer. `weights` is
    * row-major (out × in). Stays entirely inside codegen'd
    * higher-order expressions; no shuffle at all. */
  def fcLayer(input: DataFrame, vecCol: String, weights: Array[Array[Double]],
              bias: Array[Double], relu: Boolean): DataFrame = {
    val outCols = weights.indices.map { o =>
      val w = array(weights(o).map(lit): _*)
      val pre = VectorFunctions.vecDot(col(vecCol), w) + lit(bias(o))
      if (relu) greatest(pre, lit(0.0)) else pre
    }
    input.withColumn("fc_out", array(outCols: _*))
  }
}
