package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Holt's linear exponential smoothing per key: smoothed level +
  * trend fit over each time series in one pass, then h-step-ahead
  * linear forecasts. (Reference analog: the predictive filter, ref
  * op #34 /root/reference/firmware/middleware/fixed_point_filter.c:
  * 141-199, extrapolates 2·y₁ − y₂ from the last two points — Holt
  * is its smoothed generalization: level ≈ where the series is,
  * trend ≈ its slope, both exponentially weighted.)
  *
  *   level_t = α·y_t + (1−α)·(level_{t−1} + trend_{t−1})
  *   trend_t = β·(level_t − level_{t−1}) + (1−β)·trend_{t−1}
  *   forecast(h) = level_n + h·trend_n
  *
  * Scale shape: the same secondary-sort discipline as
  * StatefulOps.emaBatch — ONE shuffle co-locates each key, the
  * Tungsten spill-able sort orders (key, t) within partitions, and a
  * single streaming fold carries O(1) state per key, emitting the
  * horizon rows at each key boundary. No whole-group
  * materialization: a key with 10⁸ points streams through in
  * constant memory.
  *
  * Determinism: the fold visits points in (key, t, v) order — the v
  * tiebreak pins series with duplicate timestamps to one order on
  * any partitioning. Outputs are rounded to 9 dp. */
object Forecast {

  final case class SeriesPoint(key: Long, t: Long, v: Double)
  final case class HoltForecast(key: Long, n: Long, level: Double,
                                trend: Double, h: Int, forecast: Double)
  final case class HoltResidual(key: Long, t: Long, v: Double,
                                predicted: Double, residual: Double)

  private def r9(x: Double): Double = math.rint(x * 1e9) / 1e9

  /** Fit per key and emit `horizon` forecast rows per key
    * (h = 1..horizon). A single-point series has trend 0 and forecasts
    * flat at its value. */
  def holt(points: Dataset[SeriesPoint], alpha: Double, beta: Double,
           horizon: Int): Dataset[HoltForecast] = {
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    val spark = points.sparkSession
    import spark.implicits._
    points
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("t"), col("v"))
      .mapPartitions { it =>
        val in = it.buffered
        new Iterator[HoltForecast] {
          private var pending: List[HoltForecast] = Nil
          private def refill(): Unit =
            while (pending.isEmpty && in.hasNext) {
              val key = in.head.key
              var level = 0.0
              var trend = 0.0
              var n = 0L
              while (in.hasNext && in.head.key == key) {
                val p = in.next()
                if (n == 0L) level = p.v
                else {
                  val prev = level
                  level = alpha * p.v + (1 - alpha) * (level + trend)
                  trend = beta * (level - prev) + (1 - beta) * trend
                }
                n += 1
              }
              pending = (1 to horizon).toList.map(h =>
                HoltForecast(key, n, r9(level), r9(trend), h,
                  r9(level + h * trend)))
            }
          def hasNext: Boolean = { refill(); pending.nonEmpty }
          def next(): HoltForecast = {
            refill()
            val head = pending.head
            pending = pending.tail
            head
          }
        }
      }
  }

  /** Per-point one-step-ahead residuals under the same Holt fold: each
    * point's prediction is level+trend from the points BEFORE it (the
    * first point of a series predicts itself — residual 0), so the
    * residual stream is the model's genuine out-of-sample error at
    * every step. Same single secondary-sort pass and O(1) per-key
    * state as `holt`; feeding residuals to a robust threshold (MAD,
    * qa19's discipline) is the forecast-based anomaly detector
    * (eng_anomaly_forecast). */
  def holtResiduals(points: Dataset[SeriesPoint], alpha: Double,
                    beta: Double): Dataset[HoltResidual] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("t"), col("v"))
      .mapPartitions { it =>
        var curKey = Long.MinValue
        var level = 0.0
        var trend = 0.0
        var started = false
        it.map { p =>
          if (p.key != curKey) { curKey = p.key; started = false }
          val pred = if (started) level + trend else p.v
          if (!started) { level = p.v; trend = 0.0; started = true }
          else {
            val prev = level
            level = alpha * p.v + (1 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1 - beta) * trend
          }
          HoltResidual(p.key, p.t, p.v, r9(pred), r9(p.v - pred))
        }
      }
  }
}
