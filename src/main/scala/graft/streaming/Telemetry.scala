package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Telemetry sink + batch statistics — the Spark-native analog of the
  * reference's runtime feedback logger
  * (/root/reference/tools/ai_feedback.py:78-151: RuntimeLogger
  * appends batches of runtime samples as JSON files, get_statistics
  * re-reads them and reports means/percentiles).
  *
  * The sink is Structured Streaming's foreachBatch over a JSONL
  * directory — each micro-batch lands as its own append with a
  * batch_id column (the reference's per-file batch_id), so the log
  * directory is an ordinary table afterwards: `stats` is just a
  * DataFrame aggregation over `spark.read.json(dir)`. At scale the
  * same code points at object storage and the stats query
  * distributes like any other scan. */
object Telemetry {

  /** Append one batch of samples as JSONL with its batch id
    * (RuntimeLogger._save_batch analog). */
  def logBatch(df: DataFrame, dir: String, batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode("append").json(dir)

  /** Streaming telemetry sink: every micro-batch appends to `dir`. */
  def streamTo(events: DataFrame, dir: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        logBatch(batch.toDF(), dir, id)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** In-flight metrics via the Observation API (Dataset.observe →
    * CollectMetrics): the piggyback spelling of runtime telemetry —
    * counters ride the action that was running anyway, no second scan
    * (the reference's per-inference stats counters,
    * /root/reference/simulator/sim_reflex.py:89-91, accumulate the
    * same way: inside the compute pass). Returns the observation
    * handle; read `obs.get` after any action on the returned frame. */
  def observed(df: DataFrame, name: String, valueCol: String = "value")
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val watched = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(col(valueCol)).as("value_sum"),
      min(col(valueCol)).as("value_min"),
      max(col(valueCol)).as("value_max"))
    (watched, obs)
  }

  /** get_statistics analog over the logged directory: sample/batch
    * counts plus value moments and tail latency-style percentile.
    * Pass `schema` when the log layout is known — json() otherwise
    * runs a full inference pass over the directory before the
    * aggregation scan (2× the read at scale). */
  def stats(spark: SparkSession, dir: String, valueCol: String = "value",
            schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    schema.fold(spark.read)(s => spark.read.schema(s)).json(dir).agg(
      count(lit(1)).as("total_samples"),
      countDistinct(col("batch_id")).as("total_batches"),
      round(avg(col(valueCol)), 4).as("value_mean"),
      round(stddev_samp(col(valueCol)), 4).as("value_std"),
      round(expr(s"percentile($valueCol, 0.99)"), 4).as("value_p99"))
}
