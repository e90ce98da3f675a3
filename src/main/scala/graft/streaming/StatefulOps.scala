package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful stream operators — Spark-native re-expression of the
  * reference's signal-filter middleware
  * (/root/reference/firmware/middleware/fixed_point_filter.c:63-199)
  * and the 1 kHz sense→infer→actuate loop
  * (/root/reference/simulator/codegen_cim.py:524-548).
  *
  * The same per-key recurrence runs two ways:
  *  - batch: groupByKey + sorted flatMapGroups (deterministic, used
  *    by the rows-only engine check);
  *  - streaming: flatMapGroupsWithState carrying (lastEma, lastTs)
  *    across micro-batches — the true unbounded path; watermarks
  *    bound the state.
  * A unit test asserts stream == batch on bounded input (Spark's own
  * correctness idiom for stateful ops). */
object StatefulOps {

  case class Sample(user_id: Long, tsMicros: Long, eventId: Long, value: Double)
  case class EmaOut(user_id: Long, eventId: Long, ema: Double)
  case class EmaState(ema: Double)

  /** IIR low-pass: s' = α·x + (1-α)·s
    * (ref fixed_point_filter.c:63-97). */
  def emaStep(prev: Option[Double], x: Double, alpha: Double): Double =
    prev match {
      case Some(s) => alpha * x + (1 - alpha) * s
      case None    => x
    }

  /** Batch recurrence: per-user events sorted by (ts, event_id),
    * recursive EMA — unexpressible in pure SQL (hence engine-side,
    * no oracle).
    *
    * Secondary-sort shape: one shuffle co-locates each user_id, the
    * Tungsten spill-able sort orders (user, ts, event_id) within the
    * partition, and a single streaming fold carries O(1) state per
    * key. No whole-group materialization — a hot key with 10⁸ events
    * streams through in constant memory (`groupByKey.flatMapGroups`
    * with `it.toSeq` would buffer the entire group in the task). */
  def emaBatch(events: DataFrame, alpha: Double): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val samples = events.select(
        col("user_id"), unix_micros(col("ts")).as("tsMicros"),
        col("event_id").as("eventId"), col("value")).as[Sample]
    samples
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("tsMicros"), col("eventId"))
      .mapPartitions { it =>
        var curUser = Long.MinValue
        var st: Option[Double] = None
        it.map { s =>
          if (s.user_id != curUser) { curUser = s.user_id; st = None }
          val e = emaStep(st, s.value, alpha)
          st = Some(e)
          EmaOut(s.user_id, s.eventId, e)
        }
      }.toDF()
  }

  /** Streaming recurrence via flatMapGroupsWithState. Within a
    * micro-batch, rows are sorted by (ts, event_id) before folding so
    * replay of a bounded source reproduces emaBatch exactly. */
  def emaStreaming(samples: Dataset[Sample], alpha: Double): Dataset[EmaOut] = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples.groupByKey(_.user_id)
      .flatMapGroupsWithState[EmaState, EmaOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Sample], state: GroupState[EmaState]) =>
          val sorted = it.toSeq.sortBy(s => (s.tsMicros, s.eventId))
          var st: Option[Double] = state.getOption.map(_.ema)
          val out = sorted.map { s =>
            val e = emaStep(st, s.value, alpha)
            st = Some(e)
            EmaOut(uid, s.eventId, e)
          }
          st.foreach(e => state.update(EmaState(e)))
          out.iterator
      }
  }

  /** Complementary filter fusing two aligned streams
    * (ref fixed_point_filter.c:13-57): s' = α(s + gyro·dt) + (1-α)·accel.
    * Batch spelling over a joined (gyro, accel) frame. */
  case class FusedSample(user_id: Long, tsMicros: Long, gyro: Double, accel: Double)
  case class FusedOut(user_id: Long, tsMicros: Long, fused: Double)

  def complementaryBatch(fused: Dataset[FusedSample], alpha: Double): Dataset[FusedOut] = {
    val spark = fused.sparkSession
    import spark.implicits._
    // same secondary-sort shape as emaBatch: O(1) state per key, no
    // whole-group buffering
    fused
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("tsMicros"))
      .mapPartitions { it =>
        var curUser = Long.MinValue
        var st = 0.0
        var lastTs = -1L
        it.map { s =>
          if (s.user_id != curUser) { curUser = s.user_id; st = 0.0; lastTs = -1L }
          val dt = if (lastTs < 0) 0.0 else (s.tsMicros - lastTs) / 1e6
          st = alpha * (st + s.gyro * dt) + (1 - alpha) * s.accel
          lastTs = s.tsMicros
          FusedOut(s.user_id, s.tsMicros, st)
        }
      }
  }

  /** Structured-Streaming tumbling-window counts with watermark —
    * the streaming spelling of QueryInventory.qs1; asserted
    * stream==batch in tests via MemoryStream replay. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_v"))
}
