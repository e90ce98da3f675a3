package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join — the scalable spelling of
  * "a.ts in (b.ts, b.ts + W]" self-pairing (QueryInventory.qj7 /
  * Q-J7, as-of-join flavor).
  *
  * A plain equi+range join shuffles on the equi key only; within each
  * key the range predicate runs as a post-join filter, so a key with
  * n rows materializes O(n²) candidate pairs — at 100 TB a hot key
  * makes that quadratic blowup the job's bottleneck.
  *
  * This operator adds the standard time-bucket equi key: bucket width
  * = window size W, the probe side joins on its own bucket AND the
  * successor bucket (every (a,b) pair with 0 < a.ts - b.ts <= W has
  * bucket(a) ∈ {bucket(b), bucket(b)+1}), so the shuffle key becomes
  * (key, bucket) and per-task work is O(rows-per-bucket²) with
  * bucket population bounded by event rate × W, independent of total
  * history length. AQE skew-join splits residual hot buckets.
  */
object RangeJoin {

  /** Pairs (a, b) with a.key = b.key, a.ts strictly after b.ts, and
    * a.ts <= b.ts + windowMicros. Input needs columns: the key,
    * an id column (to exclude self-pairs), and a µs timestamp.
    * Returns the joined frame with a_/b_ prefixed id+ts columns. */
  def timeWindowSelfPairs(events: DataFrame, keyCol: String, idCol: String,
                          tsMicrosCol: Column, windowMicros: Long): DataFrame = {
    val base = events.select(
      col(keyCol).as("k"), col(idCol).as("id"), tsMicrosCol.as("tus"))
    val bucket = (c: Column) => (c / windowMicros).cast("long")

    val b = base.select(col("k"), col("id").as("b_id"), col("tus").as("b_tus"),
      bucket(col("tus")).as("bkt"))
    // probe side: each row participates under its own bucket and the
    // predecessor's successor — explode to 2 keys (b-side stays 1×)
    val a = base
      .select(col("k"), col("id").as("a_id"), col("tus").as("a_tus"),
        explode(array(bucket(col("tus")), bucket(col("tus")) - 1)).as("bkt"))

    a.join(b, Seq("k", "bkt"))
      .filter(col("a_id") =!= col("b_id") &&
        col("a_tus") > col("b_tus") &&
        col("a_tus") <= col("b_tus") + windowMicros)
      .select(col("k"), col("a_id"), col("a_tus"), col("b_id"), col("b_tus"))
  }
}
