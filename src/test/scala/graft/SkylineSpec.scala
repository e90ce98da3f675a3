package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skyline

/** Two-phase distributed skyline vs the naive NOT-EXISTS dominance
  * spelling, plus hand-checkable goldens. */
class SkylineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("golden: 2D skyline keeps exactly the Pareto frontier") {
    val pts = Seq(
      (1L, 1.0, 5.0),  // frontier
      (2L, 2.0, 3.0),  // frontier
      (3L, 4.0, 1.0),  // frontier
      (4L, 2.0, 4.0),  // dominated by 2
      (5L, 5.0, 5.0),  // dominated by all frontier points
      (6L, 2.0, 3.0))  // duplicate of 2 — both retained
      .toDF("id", "x", "y")
    val got = Skyline.skyline(pts, Seq("x", "y"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 6L))
  }

  test("nulls in any dimension are excluded; result is partition-invariant") {
    val pts = Seq(
      (1L, Some(1.0), Some(1.0)),
      (2L, None, Some(0.0)),     // null dim -> excluded
      (3L, Some(0.5), Some(2.0)))
      .toDF("id", "x", "y")
    def run(parts: Int) = Skyline.skyline(pts.repartition(parts), Seq("x", "y"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(run(1) == Set(1L, 3L))
    assert(run(7) == Set(1L, 3L))
  }

  test("two-phase operator equals the NOT EXISTS spelling on real data") {
    Tables.register(spark, "/root/testdata/sf0.001")
    val s = spark.table("part")
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
    val fast = Skyline.skyline(s, Seq("p_size", "p_retailprice"))
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    s.createOrReplaceTempView("sky_s")
    val naive = spark.sql(
      """SELECT a.p_partkey FROM sky_s a
        |WHERE a.p_size IS NOT NULL AND a.p_retailprice IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM sky_s b
        |    WHERE b.p_size IS NOT NULL AND b.p_retailprice IS NOT NULL
        |      AND b.p_size <= a.p_size AND b.p_retailprice <= a.p_retailprice
        |      AND (b.p_size < a.p_size OR b.p_retailprice < a.p_retailprice))""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    assert(fast == naive && fast.nonEmpty)
  }

  test("eng_skyline: non-empty mutually non-dominated 3D result") {
    val rows = EngineOps.queries("eng_skyline")(spark, "/root/testdata/sf0.001")
      .select("price", "tax", "qty").collect()
      .map(r => Array(r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // no row may dominate another
    for (a <- rows; b <- rows if !(a sameElements b)) {
      val dom = a.zip(b).forall { case (x, y) => x <= y } &&
        a.zip(b).exists { case (x, y) => x < y }
      assert(!dom, s"${a.toSeq} dominates ${b.toSeq}")
    }
  }
}
