package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Trajectory

/** DTW kernel goldens + trajectory top-k semantics. */
class TrajectorySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def dtw(a: Seq[Double], probe: Seq[Double]): Option[Double] = {
    val df = Seq(Tuple1(a)).toDF("s")
    val c = org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.DtwExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expr(col("s")), probe))
    val r = df.select(c.as("d")).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("dtw goldens: identity, time-warp invariance, hand-computed distance") {
    assert(dtw(Seq(1, 2, 3), Seq(1, 2, 3)) == Some(0.0))
    // repetition warps for free under DTW
    assert(dtw(Seq(1, 1, 2, 3), Seq(1, 2, 3)) == Some(0.0))
    assert(dtw(Seq(1, 2, 2, 3, 3, 3), Seq(1, 2, 3)) == Some(0.0))
    // |2-1| aligned at the single differing step
    assert(dtw(Seq(2, 2, 3), Seq(1, 2, 3)) == Some(1.0))
    // shifted ramp: warping absorbs the offset except at both ends —
    // path (2↔1)=1, (2↔2)=0, (3↔3)=0, (4↔3)=1
    assert(dtw(Seq(2, 3, 4), Seq(1, 2, 3)) == Some(2.0))
    // empty input has no alignment
    assert(dtw(Seq.empty[Double], Seq(1, 2, 3)).isEmpty)
  }

  test("trajectory build is time-ordered and length-capped") {
    val ev = Seq(
      (1L, 300L, 3.0), (1L, 100L, 1.0), (1L, 200L, 2.0),
      (2L, 100L, 9.0))
      .toDF("user_id", "ts", "value")
    val tr = Trajectory.build(ev, "user_id", "ts", "value", maxLen = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(tr(1L) == Seq(1.0, 2.0)) // sorted by ts, capped at 2
    assert(tr(2L) == Seq(9.0))
  }

  test("top-k ranks a planted near-identical trajectory first") {
    val base = (1 to 20).map(_.toDouble)
    val ev =
      base.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) } ++        // probe
      base.zipWithIndex.map { case (v, i) => (2L, i.toLong, v + 0.1) } ++  // near
      base.zipWithIndex.map { case (v, i) => (3L, i.toLong, 50.0 - v) }    // far
    val tr = Trajectory.build(ev.toDF("user_id", "ts", "value"),
      "user_id", "ts", "value")
    val got = Trajectory.topKSimilar(tr, probeKey = 1L, k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq == Seq(2L, 3L))
    assert(got(0)._2 < got(1)._2)
    assert(!got.map(_._1).contains(1L)) // probe excluded
  }

  test("eng_trajectory_topk: 10 deterministic nearest users") {
    val rows = EngineOps.queries("eng_trajectory_topk")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 10)
    val ds = rows.map(_.getAs[Double]("dtw"))
    assert(ds.sameElements(ds.sorted), "not distance-ascending")
    assert(!rows.map(_.getAs[Long]("user_id")).contains(1L))
  }
}
