package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IncrementalTopK

/** Incremental top-k session: cache-answerable refinements must equal
  * a fresh recompute, answer from memory (no corpus re-scan), and
  * refuse refinements the prefix cannot soundly answer. */
class IncrementalTopKSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def naive(k: Int, minScore: Double = Double.NegativeInfinity) = {
    Tables.register(spark, dir)
    spark.table("part")
      .select(col("p_partkey").as("id"), col("p_retailprice").as("score"))
      .filter(col("score") >= minScore)
      .orderBy(col("score").desc_nulls_last, col("id").asc)
      .limit(k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("refinements from the cached prefix equal a fresh recompute") {
    Tables.register(spark, dir)
    val s = IncrementalTopK.session(
      spark.table("part"), "p_partkey", col("p_retailprice"), margin = 50)
    try {
      def got(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got(s.topK(10)) == naive(10))
      assert(got(s.topK(50)) == naive(50))          // full margin
      val cut = naive(10).last._2                    // tighten to 10th score
      assert(got(s.topK(20, cut)) == naive(20, cut)) // threshold refinement
    } finally s.unpersist()
  }

  test("cache-answerable refinements never re-scan the corpus") {
    Tables.register(spark, dir)
    val s = IncrementalTopK.session(
      spark.table("part"), "p_partkey", col("p_retailprice"), margin = 25)
    try {
      val plan = s.topK(5).queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), plan.take(600))
      // a FileScan may only appear NESTED inside the InMemoryRelation
      // (the cached build plan it prints) — never above it, which
      // would mean the refinement re-read the corpus
      val fs = plan.indexOf("FileScan")
      assert(fs < 0 || fs > plan.indexOf("InMemoryRelation"), plan.take(900))
    } finally s.unpersist()
  }

  test("a refinement beyond the margin is refused, not answered weakly") {
    Tables.register(spark, dir)
    val s = IncrementalTopK.session(
      spark.table("part"), "p_partkey", col("p_retailprice"), margin = 10)
    try {
      intercept[IllegalArgumentException](s.topK(11))
      intercept[IllegalArgumentException](s.topK(11, 0.0))
    } finally s.unpersist()
  }
}
