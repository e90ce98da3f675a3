package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trajectory top-k similarity search over per-key event sequences
  * (REPOSE, ICDE 2021 — PAPERS.md): build one value trajectory per
  * key (time-ordered, length-capped), then rank keys by DTW distance
  * to a probe key's trajectory.
  *
  * Scale shape:
  *  - TRAJECTORY BUILD: one groupBy(key) with sort_array over
  *    (ts, value) structs — a single shuffle keyed by the entity, the
  *    same shape as any sessionization; the length cap bounds state.
  *  - PROBE: one key's trajectory to the driver (bounded by the cap —
  *    an index-build artifact like the ANN probe vector).
  *  - SCORING: compiled DTW projection (expressions.DtwExpr) into
  *    TakeOrderedAndProject — shuffle-free after the build; at 100 TB
  *    the corpus-side cost is one aggregation pass + scan-bandwidth
  *    scoring. */
object Trajectory {

  /** (key, traj: array<double>) — values time-ordered per key, first
    * `maxLen` samples. Ties on ts break by value for determinism. */
  def build(events: DataFrame, keyCol: String, tsCol: String,
            valCol: String, maxLen: Int = 64): DataFrame =
    events
      .groupBy(col(keyCol).as("key"))
      .agg(slice(sort_array(collect_list(struct(
        col(tsCol).as("t"), col(valCol).cast("double").as("v")))),
        1, maxLen).as("tv"))
      .select(col("key"), transform(col("tv"), e => e.getField("v")).as("traj"))

  /** Top-k keys nearest to `probeKey`'s trajectory by DTW (the probe
    * key itself excluded; distance 0 ≡ identical trajectory). Pass a
    * pre-fetched `probe` to skip the one-row lookup (callers that
    * cache it per session, like the ANN probe vector). */
  def topKSimilar(traj: DataFrame, probeKey: Long, k: Int,
                  probeOpt: Option[Seq[Double]] = None): DataFrame = {
    val probe: Seq[Double] = probeOpt.getOrElse(
      traj.filter(col("key") === probeKey)
        .select(col("traj")).head().getSeq[Double](0))
    val dtw = org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.DtwExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expr(col("traj")), probe))
    traj.filter(col("key") =!= probeKey)
      .select(col("key"), round(dtw, 4).as("dtw"))
      .orderBy(col("dtw").asc_nulls_last, col("key").asc)
      .limit(k)
  }
}
