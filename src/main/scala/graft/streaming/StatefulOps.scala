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

  /** The SAME recurrence on Spark 4's transformWithState — the
    * successor API to flatMapGroupsWithState (typed per-key state
    * handles, TTL, timers; requires the RocksDB state store
    * provider). Kept value-identical to emaStreaming so either
    * spelling satisfies the stream==batch contract (asserted in
    * StatefulOpsSpec). */
  private class EmaProcessor(alpha: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Sample, EmaOut] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[Double] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[Double]("ema",
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Sample],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[EmaOut] = {
      val sorted = rows.toSeq.sortBy(s => (s.tsMicros, s.eventId))
      var st: Option[Double] = if (state.exists()) Some(state.get()) else None
      val out = sorted.map { s =>
        val e = emaStep(st, s.value, alpha)
        st = Some(e)
        EmaOut(key, s.eventId, e)
      }
      st.foreach(state.update)
      out.iterator
    }
  }

  def emaTransformWithState(samples: Dataset[Sample], alpha: Double): Dataset[EmaOut] = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples.groupByKey(_.user_id)
      .transformWithState(new EmaProcessor(alpha),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
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

  // --- LSTM recurrence (ref op #5: CIM_LSTM,
  // /root/reference/imc22_sdk/imc22_cim.c:144-171, carries (h, c)
  // across steps per codegen_cim.py:405-428; the accelerator's gate
  // math is opaque hardware, so the cell uses the standard public
  // LSTM formulation: i,f,o = σ(W·x + U·h + b), g = tanh(...),
  // c' = f⊙c + i⊙g, h' = o⊙tanh(c')) ---

  case class LstmOut(user_id: Long, eventId: Long, h0: Double, hNorm: Double)
  case class LstmState(h: Array[Double], c: Array[Double])

  /** Deterministic seeded weights: gate g ∈ {i,f,o,g}, unit u,
    * recurrent source v (v = hidden for the input weight, hidden+1
    * for the bias). Small magnitudes keep gates away from
    * saturation. */
  def lstmWeight(seed: Long, gate: Int, unit: Int, src: Int): Double =
    ((seed + gate * 31L + unit * 17L + src * 7L) % 19L - 9L) / 40.0

  /** One LSTM cell step on a scalar input. Exposed for the spec's
    * independent recomputation. */
  def lstmStep(st: LstmState, x: Double, hidden: Int, seed: Long): LstmState = {
    def sigmoid(z: Double) = 1.0 / (1.0 + math.exp(-z))
    val nh = new Array[Double](hidden)
    val nc = new Array[Double](hidden)
    var u = 0
    while (u < hidden) {
      def pre(g: Int): Double = {
        var z = lstmWeight(seed, g, u, hidden) * x + lstmWeight(seed, g, u, hidden + 1)
        var v = 0
        while (v < hidden) { z += lstmWeight(seed, g, u, v) * st.h(v); v += 1 }
        z
      }
      val i = sigmoid(pre(0)); val f = sigmoid(pre(1))
      val o = sigmoid(pre(2)); val g = math.tanh(pre(3))
      nc(u) = f * st.c(u) + i * g
      nh(u) = o * math.tanh(nc(u))
      u += 1
    }
    LstmState(nh, nc)
  }

  /** Batch LSTM over per-user event streams — same secondary-sort
    * shape as emaBatch: one shuffle, O(hidden) state per key, no
    * group materialization. Emits h₀ and ‖h‖₂ per step. */
  def lstmBatch(events: DataFrame, hidden: Int = 4, seed: Long = 7L): DataFrame = {
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
        var st = LstmState(new Array[Double](hidden), new Array[Double](hidden))
        it.map { s =>
          if (s.user_id != curUser) {
            curUser = s.user_id
            st = LstmState(new Array[Double](hidden), new Array[Double](hidden))
          }
          st = lstmStep(st, s.value, hidden, seed)
          LstmOut(s.user_id, s.eventId, st.h(0),
            math.sqrt(st.h.map(h => h * h).sum))
        }
      }.toDF()
  }

  /** Streaming LSTM via flatMapGroupsWithState carrying (h, c) —
    * the unbounded spelling; stream == batch on bounded replay. */
  def lstmStreaming(samples: Dataset[Sample], hidden: Int = 4,
                    seed: Long = 7L): Dataset[LstmOut] = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples.groupByKey(_.user_id)
      .flatMapGroupsWithState[LstmState, LstmOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Sample], state: GroupState[LstmState]) =>
          val sorted = it.toSeq.sortBy(s => (s.tsMicros, s.eventId))
          var st = state.getOption.getOrElse(
            LstmState(new Array[Double](hidden), new Array[Double](hidden)))
          val out = sorted.map { s =>
            st = lstmStep(st, s.value, hidden, seed)
            LstmOut(uid, s.eventId, st.h(0), math.sqrt(st.h.map(h => h * h).sum))
          }
          state.update(st)
          out.iterator
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

  /** Structured-Streaming SESSION-window counts per user — the
    * streaming spelling of QueryInventory.qs5's native
    * session_window (ref op #36). The state store merges windows as
    * late rows extend a session; with a watermark the state for
    * closed sessions is evicted (append mode) — the replay entries
    * drain with complete mode, where the watermark never evicts, so
    * the drained result is deterministic and equals the batch
    * session_window aggregation exactly (asserted in
    * StatefulOpsSpec). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))

  /** Streaming exact deduplication — the unbounded spelling of
    * ql2/eng_exact_dedup. The event-time column rides in the dedup
    * key so the watermark bounds state: keys older than the delay are
    * dropped from the store instead of accumulating forever (Spark
    * only evicts dropDuplicates state when the event-time column is
    * part of the dedup key — the only viable contract on an unbounded
    * stream; identical duplicates separated by more than the
    * watermark are by-design re-admitted).
    *
    * CONTRACT: this is exact-ROW dedup on (keyCols, ts) — `keyCols`
    * must functionally determine the event time (duplicates are exact
    * replays, as in eng_streaming_dedup where event_id pins ts). Two
    * rows sharing a key but carrying DIFFERENT timestamps both
    * survive (pinned in StatefulOpsSpec's "same key, new ts" row);
    * for retries that restamp clocks use [[streamingDedupWithin]],
    * which drops any within-watermark copy without ts in the key. */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
                     tsCol: String = "ts", delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicates(keyCols :+ tsCol)

  /** Stream-stream time-interval INNER join — the unbounded spelling
    * of the complementary filter's two-channel fusion (ref op #32,
    * /root/reference/firmware/middleware/fixed_point_filter.c:13-57
    * fuses gyro+accel): each left sample pairs with right samples of
    * the same user inside [l.ts, l.ts + tolerance]. BOTH sides carry
    * watermarks and the join condition bounds event time in both
    * directions, so Spark evicts buffered rows older than
    * watermark − tolerance — state is O(rate × tolerance) per key,
    * never O(stream). Inner-join output is invariant to micro-batch
    * boundaries (stream==batch asserted in StatefulOpsSpec).
    *
    * joinType "leftOuter" adds the missing-channel semantics: a left
    * sample with no right match emits null-extended once the
    * watermark proves no match can still arrive (sensor-dropout
    * detection in the ref's fusion loop). */
  def streamStreamFuse(left: DataFrame, right: DataFrame,
                       delay: String = "10 minutes",
                       tolerance: String = "1 minute",
                       joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", delay).alias("l")
    val r = right.withWatermark("ts", delay).alias("r")
    l.join(r, expr(
        s"""l.user_id = r.user_id AND
           |r.ts >= l.ts AND
           |r.ts <= l.ts + INTERVAL $tolerance""".stripMargin), joinType)
      .select(col("l.user_id").as("user_id"), col("l.ts").as("l_ts"),
        col("r.ts").as("r_ts"), col("l.value").as("gyro"),
        col("r.value").as("accel"))
  }

  /** Near-arrival dedup via dropDuplicatesWithinWatermark: duplicates
    * may carry DIFFERENT event times (retries restamp clocks); any
    * copy arriving within the watermark of the first is dropped,
    * without the timestamp participating in the key. */
  def streamingDedupWithin(events: DataFrame, keyCols: Seq[String],
                           tsCol: String = "ts", delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
}
