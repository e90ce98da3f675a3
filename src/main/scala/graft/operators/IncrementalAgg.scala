package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-rollup
  * pattern every periodic 100 TB pipeline needs: keep per-key
  * MERGEABLE partial state, fold each arriving partition into it, and
  * finalize on read, so ingesting a day of data costs O(day), never
  * O(history). (Engine analog of the reference's running telemetry
  * accumulators, /root/reference/firmware/middleware/telemetry.c —
  * state that absorbs samples without replaying the past.)
  *
  * State per key: count, sum, sum-of-squares, min, max (all
  * algebraic, so merge = sum/min/max) plus an HLL sketch for distinct
  * counts (union-mergeable — the sketch makes COUNT(DISTINCT), which
  * is NOT algebraic, maintainable). On the 2-decimal test values the
  * sums are exact in double (integer cents scaled), so the
  * incremental and direct paths agree bit-for-bit (spec-asserted);
  * general doubles agree to fp reassociation.
  */
object IncrementalAgg {

  /** Mergeable per-key partial state of one data slice. */
  def partial(df: DataFrame, keyCols: Seq[String], valCol: String,
              distinctCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("pa_n"),
      sum(col(valCol)).as("pa_s"),
      sum(col(valCol) * col(valCol)).as("pa_s2"),
      min(col(valCol)).as("pa_mn"),
      max(col(valCol)).as("pa_mx"),
      expr(s"hll_sketch_agg($distinctCol)").as("pa_hll"))

  /** Folds partial states together (any number of slices, any
    * grouping of arrivals — merge is associative + commutative). */
  def merge(keyCols: Seq[String], parts: DataFrame*): DataFrame =
    parts.reduce(_.unionByName(_)).groupBy(keyCols.map(col): _*).agg(
      sum(col("pa_n")).as("pa_n"),
      sum(col("pa_s")).as("pa_s"),
      sum(col("pa_s2")).as("pa_s2"),
      min(col("pa_mn")).as("pa_mn"),
      max(col("pa_mx")).as("pa_mx"),
      expr("hll_union_agg(pa_hll)").as("pa_hll"))

  /** Renders the user-facing rollup from the partial state. */
  def finalize(p: DataFrame, keyCols: Seq[String]): DataFrame =
    p.select(keyCols.map(col) ++ Seq(
      col("pa_n").as("n"),
      round(col("pa_s"), 4).as("sum_v"),
      round(col("pa_s") / col("pa_n"), 4).as("avg_v"),
      round(col("pa_s2") / col("pa_n")
        - (col("pa_s") / col("pa_n")) * (col("pa_s") / col("pa_n")), 4).as("var_v"),
      round(col("pa_mn"), 4).as("min_v"),
      round(col("pa_mx"), 4).as("max_v"),
      expr("hll_sketch_estimate(pa_hll)").as("approx_distinct")): _*)
}
