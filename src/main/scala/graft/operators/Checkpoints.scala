package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (PageRank,
  * DedupClusters): without it, iterative plans double in depth each
  * sweep and the optimizer re-walks the whole lineage per action.
  *
  * Two durability levels, chosen per call:
  *  - `localCheckpoint` (default, `checkpointDir = None`): blocks
  *    live on executors — free of distributed-FS traffic, right for
  *    local/bench runs, but an executor loss mid-iteration kills the
  *    job because the truncated lineage cannot be recomputed.
  *  - reliable `checkpoint` (`checkpointDir = Some(dir)`): blocks
  *    written to a fault-tolerant directory (HDFS/object store on a
  *    cluster), so lost executors recover from the checkpoint instead
  *    of failing the job — the correct setting for long iterative
  *    jobs at 100 TB, at the cost of one write+read per truncation.
  *
  * Results are bit-identical either way (asserted in
  * PageRankSpec/DedupClustersSpec); only failure recovery differs. */
object Checkpoints {

  /** The raw dir last passed to setCheckpointDir, per context.
    * SparkContext stores the QUALIFIED path plus a random UUID
    * subdirectory (`file:<dir>/<uuid>`), so comparing
    * `getCheckpointDir` against the raw string never matches — the
    * naive guard would re-run setCheckpointDir on every truncation
    * and scatter checkpoint blocks across one fresh UUID directory
    * per call. Tracking the raw dir keeps repeated truncations of an
    * iterative job in ONE directory. */
  private val lastRawDir = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.SparkContext, String]())

  /** Eagerly truncate `df`'s lineage at the durability level implied
    * by `checkpointDir`. Setting the context's checkpoint dir is
    * idempotent per raw path; distinct dirs across calls are honored
    * last-wins (Spark's own semantics). */
  def truncate(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (lastRawDir.get(sc) != dir) {
          sc.setCheckpointDir(dir)
          lastRawDir.put(sc, dir)
        }
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
}
