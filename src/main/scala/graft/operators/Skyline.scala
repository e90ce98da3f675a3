package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Distributed skyline (Pareto-optimal set) — all rows not dominated
  * by any other row, minimizing every dimension; row `a` dominates
  * `b` when a ≤ b in all dims and a < b in at least one. The classic
  * multi-criteria "best tradeoffs" operator (per the retrieved
  * "Integration of Skyline Queries into Spark SQL", EDBT 2023 —
  * PAPERS.md; pattern only, no code reuse).
  *
  * Scale shape — the textbook two-phase distributed skyline:
  *  - PHASE 1 (parallel): local skyline per partition via an O(n·s)
  *    dominance scan (s = running skyline size, typically ≪ n).
  *    Every globally-optimal row survives its local pass, so phase 1
  *    only discards rows that can never qualify — at 100 TB this is
  *    where ~all data dies, shuffle-free.
  *  - PHASE 2 (single task): skyline of the union of local skylines
  *    (collectively small — bounded by partitions × local skyline
  *    size; for correlated dims it is tiny).
  * The naive spelling — a NOT EXISTS dominance anti-join — is
  * quadratic in the table and only serves as the bounded-subset
  * oracle (qx14) and the spec reference.
  *
  * The skyline SET is unique (maximal elements of a partial order),
  * so the result is partitioning- and order-invariant; rows with NULL
  * in any dimension are excluded (dominance is undefined on NULL —
  * the oracle spelling filters identically). Duplicate points (equal
  * in every dim) dominate nothing and are all retained. */
object Skyline {

  def skyline(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "at least one skyline dimension")
    val clean = df.na.drop(dims)
    val tagged = clean.withColumn("_dims",
      array(dims.map(c => col(c).cast("double")): _*))
    val enc = Encoders.row(tagged.schema)
    val dimIdx = tagged.schema.fieldIndex("_dims")

    def pass(it: Iterator[Row]): Iterator[Row] = {
      val kept = ArrayBuffer.empty[(Array[Double], Row)]
      it.foreach { r =>
        val v = r.getSeq[Double](dimIdx).toArray
        var dominated = false
        var i = 0
        while (i < kept.length && !dominated) {
          if (dominates(kept(i)._1, v)) dominated = true
          else if (dominates(v, kept(i)._1)) {
            // keep the buffer compact: drop the newly-dominated entry
            kept(i) = kept.last
            kept.dropRightInPlace(1)
            i -= 1 // re-examine the swapped-in entry
          }
          i += 1
        }
        if (!dominated) kept += ((v, r))
      }
      kept.iterator.map(_._2)
    }

    val local = tagged.mapPartitions(pass(_))(enc)
    // phase 2: one task over the union of local skylines
    val global = local.repartition(1).mapPartitions(pass(_))(enc)
    global.drop("_dims")
  }

  /** a dominates b: a ≤ b everywhere, a < b somewhere. */
  private def dominates(a: Array[Double], b: Array[Double]): Boolean = {
    var strict = false
    var i = 0
    while (i < a.length) {
      if (a(i) > b(i)) return false
      if (a(i) < b(i)) strict = true
      i += 1
    }
    strict
  }
}
