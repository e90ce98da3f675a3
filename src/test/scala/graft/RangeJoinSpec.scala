package graft

import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("bucketed range join result equals the declarative SQL spelling") {
    Tables.register(spark, dir)
    val sqlRows = spark.sql(QueryInventory.qj7.sparkSql)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val implRows = QueryInventory.qj7.impl.get(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(implRows == sqlRows)
    assert(sqlRows.nonEmpty)
  }

  test("profiler harvests operator metrics through AQE") {
    Tables.register(spark, dir)
    val res = Profiler.profile("qa1", spark.sql(QueryInventory.qa1.sparkSql))
    assert(res.rows == 6)
    assert(res.stats.nonEmpty)
    assert(res.stats.exists(_.metric.contains("numOutputRows")))
    val csv = Profiler.toCsv(Seq(res))
    assert(csv.startsWith("query,wall_sec,rows"))
    assert(csv.linesIterator.size > 3)
  }
}
