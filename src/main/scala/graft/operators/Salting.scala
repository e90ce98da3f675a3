package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation — the explicit skew-mitigation path
  * for hot keys (AQE's skew-join splitting covers joins; this covers
  * aggregations whose partial-aggregate hash map is dominated by one
  * key).
  *
  * Phase 1 spreads each key over `salts` sub-keys (deterministic salt
  * from a row-distinguishing column) and partially aggregates; phase
  * 2 merges the partials per key. Decomposable aggregates only —
  * sum/count/min/max here, avg derived as sum/count. */
object Salting {

  /** Salted sum/count/avg/min/max of `valueCol` per `keyCol`.
    * `distinctCol` is any column that varies within a key (used only
    * to derive the salt deterministically). */
  def saltedStats(df: DataFrame, keyCol: String, valueCol: String,
                  distinctCol: String, salts: Int): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(col(distinctCol)), lit(salts)))
    val partial = salted.groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("s"), count(lit(1)).as("c"),
        min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))
    partial.groupBy(col(keyCol))
      .agg(sum(col("s")).as("sum_v"), sum(col("c")).as("cnt"),
        min(col("mn")).as("min_v"), max(col("mx")).as("max_v"))
      .withColumn("avg_v", col("sum_v") / col("cnt"))
  }

  /** Salted equi-join — the join member of the skew pair. The probe
    * (large) side derives a deterministic salt per row from
    * `distinctCol`; the build (small) side is replicated `salts`×
    * with an exploded salt column; the join runs on (key, salt), so a
    * hot key's probe rows spread over `salts` tasks instead of one
    * straggler. Result is EXACTLY the plain equi-join (asserted in
    * LayoutSpec): each probe row meets precisely the one replica of
    * its key carrying its salt, and build-side replication never
    * duplicates output because the salt is part of the join key.
    *
    * 100 TB shape: AQE's skew-join splitting repairs sort-merge skew
    * after it materializes; the explicit salt removes the hot
    * partition before the shuffle exists, at the cost of `salts`×
    * build-side replication — the right trade when the build side is
    * dimension-sized and the skew is known up front. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 distinctCol: String, salts: Int): DataFrame = {
    val l = large.withColumn("_salt",
      pmod(xxhash64(col(distinctCol)), lit(salts.toLong)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
