package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed interval-overlap join — the scalable spelling of
  * "a.start <= b.end AND b.start <= a.end" between two interval sets
  * (QueryInventory.qj14).
  *
  * A plain overlap join has NO equi key, so Spark plans a broadcast
  * nested loop — O(|L|·|R|) comparisons, a non-starter at 100 TB.
  * Bucketing restores an equi key: each interval explodes to every
  * time bucket it spans, pairs join on the bucket, and the overlap
  * predicate runs inside the bucket. Any overlapping pair shares at
  * least the bucket containing max(l_start, r_start) (that instant
  * lies in both intervals), and the guard
  * `bkt == max(bucket(l_start), bucket(r_start))` emits each pair in
  * exactly that one bucket — no post-join dedup pass.
  *
  * Shuffle key = bucket id; per-task work is O(per-bucket L × R),
  * bounded by interval density × bucket width, independent of total
  * history length. Explode factor per row = interval length / bucket
  * width + 1, so pick a bucket near the typical interval length. AQE
  * skew-join splits residual hot buckets.
  */
object IntervalJoin {

  /** Overlapping pairs (closed intervals, touching endpoints count).
    * `left` must carry columns (l_id, l_start, l_end), `right`
    * (r_id, r_start, r_end) with start/end as comparable numerics
    * (e.g. epoch µs); id columns may be any type (pack composite
    * identity into a struct). Returns all six columns, each
    * overlapping pair exactly once. */
  def overlapPairs(left: DataFrame, right: DataFrame,
                   bucketWidth: Long): DataFrame = {
    def bk(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    val lb = left.withColumn("bkt",
      explode(sequence(bk(col("l_start")), bk(col("l_end")))))
    val rb = right.withColumn("bkt",
      explode(sequence(bk(col("r_start")), bk(col("r_end")))))
    lb.join(rb, Seq("bkt"))
      .filter(col("l_start") <= col("r_end") &&
        col("r_start") <= col("l_end") &&
        col("bkt") === greatest(bk(col("l_start")), bk(col("r_start"))))
      .select(col("l_id"), col("l_start"), col("l_end"),
        col("r_id"), col("r_start"), col("r_end"))
  }
}
