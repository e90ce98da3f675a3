package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.BucketedTables

class BucketedTablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed fact join plans without a shuffle exchange") {
    BucketedTables.bucketFacts(spark, "/root/testdata/sf0.001", nBuckets = 4)
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") || !plan.contains("hashpartitioning(l_orderkey"),
      "bucketed join should not shuffle the fact tables:\n" + plan.take(1200))
    // result sanity vs the unbucketed spelling
    Tables.register(spark, "/root/testdata/sf0.001")
    val expect = spark.table("lineitem")
      .join(spark.table("orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expect)
  }

  test("eng_bucketed_star measured query joins without fact-side exchange") {
    val df = EngineOps.queries("eng_bucketed_star")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(l_orderkey") &&
      !plan.contains("hashpartitioning(o_orderkey"),
      "bucketed star join must not shuffle either fact side:\n" + plan.take(1200))
    assert(df.collect().nonEmpty)
  }
}
