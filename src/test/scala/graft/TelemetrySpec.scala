package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Telemetry

class TelemetrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("batch log + stats round-trip matches direct aggregation") {
    val dir = tmpDir("telemetry_batch")
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
      .toDF("event_id", "value")
    Telemetry.logBatch(df.filter($"event_id" <= 2), dir, 0)
    Telemetry.logBatch(df.filter($"event_id" > 2), dir, 1)
    val s = Telemetry.stats(spark, dir).collect().head
    assert(s.getAs[Long]("total_samples") == 4)
    assert(s.getAs[Long]("total_batches") == 2)
    assert(s.getAs[Double]("value_mean") == 25.0)
    assert(s.getAs[Double]("value_p99") == 39.7)  // exact interpolated percentile
  }

  test("observation metrics ride the action — no second scan") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("event_id", "value")
    val (watched, obs) = Telemetry.observed(df, "obs_test")
    assert(watched.filter($"value" > 15).count() == 2) // the one action
    val m = obs.get
    // metrics reflect the FULL observed frame, not the downstream filter
    assert(m("n_rows") == 3L && m("value_sum") == 60.0)
    assert(m("value_min") == 10.0 && m("value_max") == 30.0)
  }

  test("streaming sink appends micro-batches with distinct batch ids") {
    val dir = tmpDir("telemetry_stream")
    val ckpt = tmpDir("telemetry_ckpt")
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Double)]
    val q = Telemetry.streamTo(
      stream.toDF().toDF("event_id", "value"), dir, ckpt)
    try {
      stream.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      stream.addData((3L, 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val s = Telemetry.stats(spark, dir).collect().head
    assert(s.getAs[Long]("total_samples") == 3)
    assert(s.getAs[Long]("total_batches") == 2)
  }

  test("observed metrics equal an explicit aggregate over the same table") {
    val sf = "/root/testdata/sf0.001"
    val out = EngineOps.queries("eng_observed_metrics")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ev = Tables.table(spark, sf, "events")
    val direct = ev.agg(
        count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("e"),
        round(sum(col("value")), 4).as("s")).collect().head
    assert(out("n_rows") == direct.getLong(0).toDouble)
    assert(out("n_error") == direct.getLong(1).toDouble)
    assert(math.abs(out("sum_v") - direct.getDouble(2)) < 1e-6)
    assert(out("n_rows") > 0)
  }
}
