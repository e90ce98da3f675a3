package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Forecast
import graft.operators.Forecast.SeriesPoint

/** Hand-computed goldens for Holt linear smoothing (α=0.3, β=0.1):
  *   y = [10, 12, 13], level₀=10, trend₀=0
  *   t₂: level = .3·12 + .7·(10+0)       = 10.6
  *       trend = .1·(10.6−10) + .9·0     = 0.06
  *   t₃: level = .3·13 + .7·(10.6+0.06)  = 11.362
  *       trend = .1·(11.362−10.6)+.9·.06 = 0.1302
  *   forecasts: 11.4922, 11.6224, 11.7526 */
class ForecastSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Holt fit matches the hand-computed golden series") {
    import spark.implicits._
    val pts = Seq(
      SeriesPoint(1L, 1L, 10.0), SeriesPoint(1L, 2L, 12.0),
      SeriesPoint(1L, 3L, 13.0)).toDS()
    val out = Forecast.holt(pts, alpha = 0.3, beta = 0.1, horizon = 3)
      .collect().sortBy(_.h)
    assert(out.length == 3)
    assert(out.forall(f => f.key == 1L && f.n == 3L))
    assert(out.forall(f => math.abs(f.level - 11.362) < 1e-9))
    assert(out.forall(f => math.abs(f.trend - 0.1302) < 1e-9))
    val fs = out.map(_.forecast)
    Seq(11.4922, 11.6224, 11.7526).zip(fs).foreach { case (e, g) =>
      assert(math.abs(e - g) < 1e-9, s"expected $e got $g")
    }
  }

  test("single-point series forecasts flat; keys fold independently") {
    import spark.implicits._
    val pts = Seq(
      SeriesPoint(7L, 5L, 42.0),
      SeriesPoint(8L, 1L, 1.0), SeriesPoint(8L, 2L, 2.0)).toDS()
    val out = Forecast.holt(pts, alpha = 0.5, beta = 0.5, horizon = 2)
      .collect().groupBy(_.key)
    val k7 = out(7L).sortBy(_.h)
    assert(k7.forall(f => f.n == 1L && f.trend == 0.0 && f.forecast == 42.0))
    val k8 = out(8L).sortBy(_.h)
    // level = .5·2 + .5·(1+0) = 1.5; trend = .5·(1.5−1) + .5·0 = 0.25
    assert(k8.forall(f => f.n == 2L && math.abs(f.level - 1.5) < 1e-9 &&
      math.abs(f.trend - 0.25) < 1e-9))
    assert(math.abs(k8(0).forecast - 1.75) < 1e-9)
    assert(math.abs(k8(1).forecast - 2.0) < 1e-9)
  }

  test("one-step residuals match the hand-computed golden series") {
    import spark.implicits._
    // y = [10, 12, 13] (α=.3, β=.1): pred₁ = 10 (self), pred₂ =
    // level₁+trend₁ = 10, pred₃ = 10.6+0.06 = 10.66
    val pts = Seq(
      SeriesPoint(1L, 1L, 10.0), SeriesPoint(1L, 2L, 12.0),
      SeriesPoint(1L, 3L, 13.0)).toDS()
    val out = Forecast.holtResiduals(pts, 0.3, 0.1).collect().sortBy(_.t)
    assert(out.map(_.predicted).toSeq == Seq(10.0, 10.0, 10.66))
    assert(math.abs(out(0).residual - 0.0) < 1e-9)
    assert(math.abs(out(1).residual - 2.0) < 1e-9)
    assert(math.abs(out(2).residual - 2.34) < 1e-9)
  }

  test("a planted spike dominates the residual stream") {
    import spark.implicits._
    // smooth ramp with one spike at t=30: the spike's residual must be
    // the largest by a wide margin (the anomaly detector's signal)
    val pts = (0L until 60L).map(t =>
      SeriesPoint(9L, t, if (t == 30L) 500.0 else 10.0 + t)).toDS()
    val out = Forecast.holtResiduals(pts, 0.3, 0.1).collect()
    val top = out.maxBy(r => math.abs(r.residual))
    assert(top.t == 30L)
    // the spike's ECHO (overshoot while level/trend recover over the
    // following ~15 steps) is inherent to Holt, so the clean baseline
    // is the PRE-spike stream; the robust MAD threshold below is what
    // the detector actually uses and sees through the echo
    val calm = out.filter(_.t < 30L).map(r => math.abs(r.residual)).max
    assert(math.abs(top.residual) > 100 * calm)
    val mad = out.map(r => math.abs(r.residual)).sorted.apply(out.length / 2)
    assert(math.abs(top.residual) > 5.19 * mad)
  }

  test("fold is invariant to input partitioning") {
    import spark.implicits._
    val pts = (0L until 200L).map(i =>
      SeriesPoint(i % 7, i / 7, math.sin(i.toDouble) * 10))
    def run(parts: Int) =
      Forecast.holt(pts.toDS().repartition(parts), 0.3, 0.1, 2)
        .collect().map(_.toString).sorted.toSeq
    assert(run(2) == run(11))
  }
}
