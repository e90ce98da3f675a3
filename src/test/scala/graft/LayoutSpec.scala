package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Salting
import graft.sources.TableLayout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("day-partitioned layout prunes partitions for date predicates") {
    Tables.register(spark, "/root/testdata/sf0.001")
    val tmp = java.nio.file.Files.createTempDirectory("graft_events_part").toString
    TableLayout.writeEventsByDay(spark.table("events"), tmp)
    val day = "2024-01-05"
    val pruned = TableLayout.readDay(spark, tmp, day)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"),
      plan.take(800))
    val expected = spark.table("events")
      .filter(to_date(col("ts")) === lit(day)).count()
    assert(pruned.count() == expected)
    assert(expected > 0)
  }

  test("codec round-trip: every parquet codec preserves the data") {
    val rows = EngineOps.queries("eng_codec_roundtrip")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("gzip", "lz4", "snappy", "zstd"))
    assert(rows.map(_.getLong(1)).distinct.length == 1)   // same row count back
    assert(rows.map(_.getLong(2)).distinct.length == 1)   // same content hash
    assert(rows.map(_.getDouble(3)).distinct.length == 1) // same value sum
    assert(rows.forall(_.getLong(4) > 0))                 // real files on disk
  }

  test("source round-trip: json/csv/parquet each re-read losslessly") {
    val rows = EngineOps.queries("eng_source_roundtrip")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("csv", "json", "parquet", "source"))
    assert(rows.map(_.getLong(1)).distinct.length == 1)   // same row count back
    assert(rows.map(_.getLong(2)).distinct.length == 1)   // same content hash
    assert(rows.map(_.getDouble(3)).distinct.length == 1) // same value sum
  }

  test("salted two-phase aggregation equals the direct group-by") {
    Tables.register(spark, "/root/testdata/sf0.001")
    val ev = spark.table("events")
    val direct = ev.groupBy(col("event_type"))
      .agg(sum(col("value")).as("sum_v"), count(lit(1)).as("cnt"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .collect().map(r => r.getString(0) ->
        (math.round(r.getDouble(1) * 100), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Salting.saltedStats(ev, "event_type", "value", "event_id", salts = 8)
      .collect().map(r => r.getString(0) ->
        (math.round(r.getDouble(1) * 100), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted == direct)
  }
}
