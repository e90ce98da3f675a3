package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of golden: latest build at-or-before each probe time") {
    val probe = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "early"), (2L, 10L, "c"))
      .toDF("k", "t", "tag")
    val build = Seq((1L, 8L, 1.0), (1L, 10L, 2.0), (1L, 15L, 3.0), (2L, 30L, 9.0))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asOf(probe, build, "k", "t")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("t"), r.getAs[String]("tag"),
        r.getAs[Long]("asof_t"), r.getAs[Double]("asof_v"))).toSet
    // t=10 matches build t=10 (>= is inclusive); t=20 matches t=15;
    // t=5 has no preceding build (dropped); key 2's build at 30 is
    // after its probe at 10 (dropped)
    assert(out == Set((1L, 10L, "a", 10L, 2.0), (1L, 20L, "b", 15L, 3.0)))
  }

  test("operator matches the qj9 union+window SQL spelling") {
    Tables.register(spark, "/root/testdata/sf0.001")
    val probe = spark.table("events").filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"))
    val build = spark.table("events").filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("t"))
      .agg(round(max(col("value")), 4).as("pval"))
      .select(col("user_id"), col("t"), col("pval"))
    val op = AsOfJoin.asOf(probe, build, "user_id", "t")
      .select(col("user_id"), col("event_id"), col("t").as("cts"),
        col("asof_t").as("pts"), col("asof_pval").as("pval"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    val sql = spark.sql(QueryInventory.qj9.sparkSql)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(op == sql && op.nonEmpty)
  }

  test("tolerance drops stale matches; operator matches qj10 SQL") {
    // golden: gap of 5 allowed, probe t=20 matched build t=15 (gap 5,
    // kept) but probe t=30 matched t=15 (gap 15, dropped)
    val probe = Seq((1L, 20L, "ok"), (1L, 30L, "stale")).toDF("k", "t", "tag")
    val build = Seq((1L, 15L, 1.0)).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(probe, build, "k", "t", maxGap = Some(lit(5L)))
      .collect().map(r => r.getAs[String]("tag")).toSet
    assert(out == Set("ok"))

    Tables.register(spark, "/root/testdata/sf0.001")
    val p = spark.table("events").filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"))
    val b = spark.table("events").filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("t"))
      .agg(round(max(col("value")), 4).as("pval"))
      .select(col("user_id"), col("t"), col("pval"))
    val op = AsOfJoin.asOf(p, b, "user_id", "t", maxGap = Some(lit(600000000L)))
      .select(col("user_id"), col("event_id"), col("t"), col("asof_t"), col("asof_pval"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    val sql = spark.sql(QueryInventory.qj10.sparkSql)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(op == sql && op.nonEmpty && sql.size < spark.sql(QueryInventory.qj9.sparkSql).count())
  }

  test("as-of plan: no join node, one window pass over a single key shuffle") {
    val probe = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val build = Seq((1L, 8L, 1.0)).toDF("k", "t", "v")
    val plan = AsOfJoin.asOf(probe, build, "k", "t").queryExecution.executedPlan.toString
    // the scalable shape: union + window, NOT a range join
    assert(!plan.contains("Join"), "as-of must not plan a join:\n" + plan.take(800))
    assert(plan.contains("Window"), "as-of should attach via a running window")
  }
}
