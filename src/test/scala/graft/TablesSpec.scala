package graft

import org.scalatest.funsuite.AnyFunSuite

class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("register follows dir changes: A -> B -> A re-registers A's views") {
    val a = "/root/testdata/sf0.001"
    val b = "/root/testdata/sf0.01"
    Tables.register(spark, a)
    val nA = spark.table("lineitem").count()
    Tables.register(spark, b)
    val nB = spark.table("lineitem").count()
    assert(nA != nB, "sf0.001 and sf0.01 must differ for this test to bite")
    // the old (session, dir) memoization made this a silent no-op,
    // leaving the views on B's data
    Tables.register(spark, a)
    assert(spark.table("lineitem").count() == nA)
  }
}
