package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.IntervalJoin

/** Bucketed interval join == naive overlap join, each pair exactly
  * once, across bucket widths (including widths far from the interval
  * scale — correctness must not depend on the tuning knob). */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic interval soup: mixed lengths, points, duplicates,
  // bucket-boundary-straddling spans
  val rnd = new scala.util.Random(11)
  val ivs: Seq[(Long, Long, Long)] = (0L until 60L).map { i =>
    val start = rnd.nextInt(10000).toLong
    val len = if (i % 7 == 0) 0L else rnd.nextInt(800).toLong
    (i, start, start + len)
  }

  def naive: Set[(Long, Long)] = (for {
    (a, as, ae) <- ivs; (b, bs, be) <- ivs
    if as <= be && bs <= ae
  } yield (a, b)).toSet

  test("matches the naive quadratic join for several bucket widths") {
    val left = ivs.toDF("l_id", "l_start", "l_end")
    val right = ivs.toDF("r_id", "r_start", "r_end")
    for (w <- Seq(100L, 500L, 1000L, 100000L)) {
      val got = IntervalJoin.overlapPairs(left, right, w).collect()
        .map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id")))
      // exactly-once: no duplicate emissions before the distinct
      assert(got.length == got.toSet.size, s"duplicate pairs at width $w")
      assert(got.toSet == naive, s"pair set mismatch at width $w")
    }
  }

  test("qj14's shipped impl joins on the bucket equi-key, not a nested loop") {
    val plan = QueryInventory.qj14.impl.get(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the whole point of the bucketed spelling: the overlap predicate
    // must run INSIDE an equi-join on bkt, never as a nested-loop /
    // cartesian pair enumeration
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested-loop join in:\n$plan")
    assert(plan.contains("bkt"), "bucket key missing from the physical plan")
  }

  test("payload columns survive the join") {
    val left = ivs.take(5).toDF("l_id", "l_start", "l_end")
    val right = ivs.take(5).toDF("r_id", "r_start", "r_end")
    val rows = IntervalJoin.overlapPairs(left, right, 1000L).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("l_start") <= r.getAs[Long]("l_end"))
      assert(r.getAs[Long]("l_start") <= r.getAs[Long]("r_end") &&
        r.getAs[Long]("r_start") <= r.getAs[Long]("l_end"))
    }
  }
}
