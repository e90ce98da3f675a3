package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps._

class StatefulOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("EMA recurrence golden: values 1,2,3 at alpha=0.5 -> 1, 1.5, 2.25") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 10L, 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 11L, 2.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 12L, 3.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = StatefulOps.emaBatch(events, alpha = 0.5)
      .orderBy("eventId").collect().map(_.getAs[Double]("ema")).toSeq
    assert(out == Seq(1.0, 1.5, 2.25))
  }

  test("streaming EMA equals batch EMA on bounded replay (state across batches)") {
    implicit val sqlCtx = spark.sqlContext
    val all = Seq(
      Sample(1L, 1000L, 1L, 1.0), Sample(1L, 2000L, 2L, 2.0),
      Sample(2L, 1500L, 3L, 10.0), Sample(1L, 3000L, 4L, 3.0),
      Sample(2L, 2500L, 5L, 20.0))
    val stream = MemoryStream[Sample]
    val q = StatefulOps.emaStreaming(stream.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("ema_out")
      .outputMode("append").start()
    try {
      stream.addData(all.take(3))
      q.processAllAvailable()
      stream.addData(all.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ema_out")
      .collect().map(r => (r.getAs[Long]("eventId"), r.getAs[Double]("ema"))).toMap
    val batchDf = all.toDF()
      .select(col("user_id"), timestamp_micros(col("tsMicros")).as("ts"),
        col("eventId").as("event_id"), col("value"))
    val batch = StatefulOps.emaBatch(batchDf, alpha = 0.5)
      .collect().map(r => (r.getAs[Long]("eventId"), r.getAs[Double]("ema"))).toMap
    assert(streamed == batch)
  }

  test("transformWithState EMA equals batch EMA (Spark 4 stateful API, RocksDB store)") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val all = Seq(
      Sample(1L, 1000L, 1L, 1.0), Sample(1L, 2000L, 2L, 2.0),
      Sample(2L, 1500L, 3L, 10.0), Sample(1L, 3000L, 4L, 3.0),
      Sample(2L, 2500L, 5L, 20.0))
    val stream = MemoryStream[Sample]
    val q = StatefulOps.emaTransformWithState(stream.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("ema_tws_out")
      .outputMode("append").start()
    try {
      stream.addData(all.take(3))
      q.processAllAvailable()
      stream.addData(all.drop(3))
      q.processAllAvailable()
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    val streamed = spark.table("ema_tws_out")
      .collect().map(r => (r.getAs[Long]("eventId"), r.getAs[Double]("ema"))).toMap
    val batchDf = all.toDF()
      .select(col("user_id"), timestamp_micros(col("tsMicros")).as("ts"),
        col("eventId").as("event_id"), col("value"))
    val batch = StatefulOps.emaBatch(batchDf, alpha = 0.5)
      .collect().map(r => (r.getAs[Long]("eventId"), r.getAs[Double]("ema"))).toMap
    assert(streamed == batch)
  }

  test("file-source streaming replay of events matches batch windowed counts") {
    // replay the real events table through a parquet file stream with
    // a watermark (SURVEY M4): bounded replay must equal batch
    val tmp = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      tmp.resolve("part-00000.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(tmp.toString)
    val fix = Tables.normalizeTs _
    val sdf = fix(spark.readStream.schema(raw.schema).parquet(tmp.toString))
    val q = StatefulOps.windowedCounts(sdf)
      .writeStream.format("memory").queryName("file_win")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("window.start").cast("long"), col("event_type"), col("cnt"), col("sum_v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        math.round(r.getDouble(3) * 100))).toSet
    val streamed = canon(spark.table("file_win"))
    val batch = canon(fix(raw)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_v")))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("file-source streaming sessionization matches batch session_window") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_events_sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      tmp.resolve("part-00000.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(tmp.toString)
    val fix = Tables.normalizeTs _
    val sdf = fix(spark.readStream.schema(raw.schema).parquet(tmp.toString))
    val q = StatefulOps.sessionCounts(sdf)
      .writeStream.format("memory").queryName("file_sess")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("session_window.start").cast("long"),
        col("session_window.end").cast("long"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val streamed = canon(spark.table("file_sess"))
    val batch = canon(fix(raw)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events")))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // merged sessions really exist (some window spans >1 event)
    assert(streamed.exists(_._4 > 1))
  }

  test("complementary filter: alpha=0 reduces to accel passthrough") {
    val in = Seq(
      FusedSample(1L, 1000000L, 5.0, 1.5),
      FusedSample(1L, 2000000L, 5.0, 2.5)).toDS()
    val out = StatefulOps.complementaryBatch(in, alpha = 0.0)
      .collect().sortBy(_.tsMicros).map(_.fused).toSeq
    assert(out == Seq(1.5, 2.5))
  }

  test("streaming windowed counts equal batch group-by on bounded input") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      ("2024-01-01 00:01:00", "a", 1.0), ("2024-01-01 00:02:00", "a", 2.0),
      ("2024-01-01 00:07:00", "a", 3.0), ("2024-01-01 00:03:30", "b", 4.0))
      .map { case (t, ty, v) => (java.sql.Timestamp.valueOf(t), ty, v) }
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val sdf = stream.toDS().toDF("ts", "event_type", "value")
    val q = StatefulOps.windowedCounts(sdf)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      stream.addData(rows)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("win_out")
      .select(col("window.start").cast("long"), col("event_type"), col("cnt"), col("sum_v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = rows.toDF("ts", "event_type", "value")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_v"))
      .select(col("window.start").cast("long"), col("event_type"), col("cnt"), col("sum_v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
  }

  test("stream-stream time-interval join equals the batch join on bounded input") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val gyro = Seq(
      (ts("2024-01-01 00:01:00"), 1L, 1.0), (ts("2024-01-01 00:05:00"), 1L, 2.0),
      (ts("2024-01-01 00:01:30"), 2L, 3.0))
    val accel = Seq(
      (ts("2024-01-01 00:01:20"), 1L, 10.0),  // within 1 min of gyro@00:01
      (ts("2024-01-01 00:05:30"), 1L, 20.0),  // within 1 min of gyro@00:05
      (ts("2024-01-01 00:03:00"), 1L, 30.0),  // matches nothing
      (ts("2024-01-01 00:01:00"), 2L, 40.0))  // BEFORE gyro@00:01:30 → no match
    val ls = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val rs = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val joined = StatefulOps.streamStreamFuse(
      ls.toDS().toDF("ts", "user_id", "value"),
      rs.toDS().toDF("ts", "user_id", "value"))
    val q = joined.writeStream.format("memory").queryName("fuse_out")
      .outputMode("append").start()
    try {
      // matches split across micro-batches: the join state must hold
      // the unmatched left rows until the right side arrives
      ls.addData(gyro)
      q.processAllAvailable()
      rs.addData(accel.take(2))
      q.processAllAvailable()
      rs.addData(accel.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
        r.getDouble(3), r.getDouble(4))
    val streamed = spark.table("fuse_out").collect().map(key).toSet
    val batch = StatefulOps.streamStreamFuse( // same condition, batch frames
        gyro.toDF("ts", "user_id", "value"), accel.toDF("ts", "user_id", "value"))
      .collect().map(key).toSet
    assert(streamed == batch)
    assert(streamed.size == 2)
  }

  test("stream-stream LEFT OUTER join null-extends once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ls = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val rs = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val joined = StatefulOps.streamStreamFuse(
      ls.toDS().toDF("ts", "user_id", "value"),
      rs.toDS().toDF("ts", "user_id", "value"), joinType = "leftOuter")
    val q = joined.writeStream.format("memory").queryName("fuse_outer")
      .outputMode("append").start()
    try {
      // batch 1: one matched left row, one UNMATCHED left row
      ls.addData(Seq((ts("2024-01-01 00:01:00"), 1L, 1.0),
        (ts("2024-01-01 00:10:00"), 1L, 2.0)))
      rs.addData(Seq((ts("2024-01-01 00:01:30"), 1L, 10.0)))
      q.processAllAvailable()
      // batch 2 advances the watermark (10-min delay) past 00:11
      ls.addData(Seq((ts("2024-01-01 01:00:00"), 1L, 3.0)))
      rs.addData(Seq((ts("2024-01-01 01:00:10"), 1L, 30.0)))
      q.processAllAvailable()
      // batch 3 triggers eviction of the proven-unmatched row
      ls.addData(Seq((ts("2024-01-01 02:00:00"), 1L, 4.0)))
      rs.addData(Seq((ts("2024-01-01 02:00:10"), 1L, 40.0)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("fuse_outer").collect()
      .map(r => (r.getTimestamp(1).getTime / 1000,
        if (r.isNullAt(2)) -1L else r.getTimestamp(2).getTime / 1000,
        r.getDouble(3))).toSet
    def sec(s: String) = ts(s).getTime / 1000
    // the three matches emit eagerly; the unmatched 00:10 row emits
    // null-extended after the watermark proves no match can arrive
    assert(out.contains((sec("2024-01-01 00:01:00"), sec("2024-01-01 00:01:30"), 1.0)))
    assert(out.contains((sec("2024-01-01 01:00:00"), sec("2024-01-01 01:00:10"), 3.0)))
    assert(out.contains((sec("2024-01-01 02:00:00"), sec("2024-01-01 02:00:10"), 4.0)))
    assert(out.contains((sec("2024-01-01 00:10:00"), -1L, 2.0)),
      s"null-extended row missing from $out")
  }

  test("streaming dedup equals batch distinct; watermark bounds the key") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      ("2024-01-01 00:01:00", 1L, "a"), ("2024-01-01 00:01:00", 1L, "a"), // dup
      ("2024-01-01 00:02:00", 1L, "a"), // same key, NEW ts — survives: exact-ROW contract
      ("2024-01-01 00:02:00", 2L, "b"), ("2024-01-01 00:02:00", 2L, "b"), // dup
      ("2024-01-01 00:03:00", 3L, "c"))
      .map { case (t, u, ty) => (java.sql.Timestamp.valueOf(t), u, ty) }
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val sdf = stream.toDS().toDF("ts", "user_id", "event_type")
    val q = StatefulOps.streamingDedup(sdf, Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // duplicates split across micro-batches: state must carry over
      stream.addData(rows.take(3))
      q.processAllAvailable()
      stream.addData(rows.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("dedup_out")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getString(2))).toSet
    val batch = rows.toDF("ts", "user_id", "event_type").distinct()
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getString(2))).toSet
    assert(streamed == batch)
    assert(streamed.size == 4)
  }

  test("dedup-within-watermark drops restamped duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      ("2024-01-01 00:01:00", 1L, "a"),
      ("2024-01-01 00:01:30", 1L, "a"),  // same key, restamped clock
      ("2024-01-01 00:02:00", 2L, "b"))
      .map { case (t, u, ty) => (java.sql.Timestamp.valueOf(t), u, ty) }
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val sdf = stream.toDS().toDF("ts", "user_id", "event_type")
    val q = StatefulOps.streamingDedupWithin(sdf, Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup_within_out")
      .outputMode("append").start()
    try {
      stream.addData(rows)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("dedup_within_out")
      .collect().map(r => (r.getLong(1), r.getString(2))).toSeq.sorted
    assert(streamed == Seq((1L, "a"), (2L, "b")))
  }

  test("LSTM batch recurrence matches an independent fold; resets per user") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 10L, 0.5),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 11L, -0.3),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 20L, 0.5))
      .toDF("user_id", "ts", "event_id", "value")
    val out = StatefulOps.lstmBatch(events, hidden = 3, seed = 7L)
      .collect().map(r => r.getAs[Long]("eventId") ->
        (r.getAs[Double]("h0"), r.getAs[Double]("hNorm"))).toMap

    // independent fold through the exposed cell step
    var st = LstmState(new Array[Double](3), new Array[Double](3))
    st = StatefulOps.lstmStep(st, 0.5, 3, 7L)
    val exp1 = (st.h(0), math.sqrt(st.h.map(h => h * h).sum))
    st = StatefulOps.lstmStep(st, -0.3, 3, 7L)
    val exp2 = (st.h(0), math.sqrt(st.h.map(h => h * h).sum))
    assert(math.abs(out(10L)._1 - exp1._1) < 1e-12 && math.abs(out(10L)._2 - exp1._2) < 1e-12)
    assert(math.abs(out(11L)._1 - exp2._1) < 1e-12 && math.abs(out(11L)._2 - exp2._2) < 1e-12)
    // user 2 starts from zero state: same first-step output as user 1
    assert(out(20L) == out(10L))
  }

  test("streaming LSTM equals batch LSTM on bounded replay") {
    implicit val sqlCtx = spark.sqlContext
    val all = Seq(
      Sample(1L, 1000L, 1L, 1.0), Sample(1L, 2000L, 2L, -0.5),
      Sample(2L, 1500L, 3L, 2.0), Sample(1L, 3000L, 4L, 0.25),
      Sample(2L, 2500L, 5L, -1.0))
    val stream = MemoryStream[Sample]
    val q = StatefulOps.lstmStreaming(stream.toDS(), hidden = 3, seed = 7L)
      .writeStream.format("memory").queryName("lstm_out")
      .outputMode("append").start()
    try {
      stream.addData(all.take(3))
      q.processAllAvailable()
      stream.addData(all.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("lstm_out")
      .collect().map(r => r.getAs[Long]("eventId") ->
        (r.getAs[Double]("h0"), r.getAs[Double]("hNorm"))).toMap
    val batchDf = all.toDF()
      .select(col("user_id"), timestamp_micros(col("tsMicros")).as("ts"),
        col("eventId").as("event_id"), col("value"))
    val batch = StatefulOps.lstmBatch(batchDf, hidden = 3, seed = 7L)
      .collect().map(r => r.getAs[Long]("eventId") ->
        (r.getAs[Double]("h0"), r.getAs[Double]("hNorm"))).toMap
    assert(streamed == batch)
  }

  test("measured eng_stream_join is NON-EMPTY on the test tables") {
    // guards the bench entry against the round-4 failure mode: a
    // tolerance so tight no click/view pair matches, making a broken
    // join indistinguishable from a working one (0 rows either way)
    val rows = EngineOps.queries("eng_stream_join")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "stream-stream join produced 0 rows — " +
      "join tolerance no longer matches the synthetic event density")
    assert(rows.forall(_.getAs[Long]("n_pairs") > 0))
  }

  test("eng_streaming_dedup collapses the doubled replay to batch distinct counts") {
    // the entry replays every event twice; per-type counts must equal
    // the batch DISTINCT-event_id counts — a dedup miss doubles one
    val out = EngineOps.queries("eng_streaming_dedup")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_unique")).toMap
    val batch = Tables.table(spark, "/root/testdata/sf0.001", "events")
      .dropDuplicates("event_id")
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    assert(out == batch)
    assert(out.values.sum > 0)
  }

  test("sessions + dedup are provider-uniform: HDFS-backed and RocksDB state stores agree") {
    // eng_ema_stateful already exercises transformWithState on
    // RocksDB; this matrix makes the 100 TB state story uniform for
    // the remaining stateful entries — the session-window aggregation
    // and the watermarked dedup run on BOTH providers (fresh
    // checkpoints, so each run picks up the session conf) and must
    // produce identical results
    val dir = "/root/testdata/sf0.001"
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    def run(): (Seq[String], Seq[String]) = (
      EngineOps.queries("eng_streaming_sessions")(spark, dir)
        .collect().map(_.toString).toSeq,
      EngineOps.queries("eng_streaming_dedup")(spark, dir)
        .collect().map(_.toString).toSeq)
    try {
      spark.conf.unset(key) // Spark default: HDFSBackedStateStoreProvider
      val (sessH, dedupH) = run()
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val (sessR, dedupR) = run()
      assert(sessH.nonEmpty && dedupH.nonEmpty)
      assert(sessH == sessR)
      assert(dedupH == dedupR)
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("eng_stream_enrich: stream-static join census equals batch, reapply idempotent") {
    val dir = "/root/testdata/sf0.001"
    val out = EngineOps.queries("eng_stream_enrich")(spark, dir).collect()
    assert(out.nonEmpty)
    // redelivering the same payload must leave the partitioned sink
    // unchanged — the idempotent exactly-once sink contract
    assert(out.forall(_.getAs[Boolean]("reapply_identical")),
      "dynamic-partition-overwrite redelivery changed the sink")
    val byTier = out.map(r =>
      r.getAs[Int]("tier") -> r.getAs[Long]("n_events")).toMap
    // the dim covers even user_ids only: the miss path (tier -1)
    // must be measured, not silently dropped by an inner join
    assert(byTier.contains(-1), "left-join miss path missing from census")
    // per-tier counts equal the batch spelling of the same enrichment
    val ev = Tables.table(spark, dir, "events")
    val dim = ev.select(col("user_id")).distinct()
      .filter(col("user_id") % 2 === 0)
      .withColumn("tier", pmod(col("user_id"), lit(5)).cast("int"))
    val batch = ev.join(dim, Seq("user_id"), "left")
      .withColumn("tier", coalesce(col("tier"), lit(-1)))
      .groupBy(col("tier")).count().collect()
      .map(r => r.getAs[Int]("tier") -> r.getAs[Long]("count")).toMap
    assert(byTier == batch)
    assert(byTier.values.sum == ev.count())
  }

  test("eng_stream_recovery restarts exactly-once from the checkpoint") {
    val rows = EngineOps.queries("eng_stream_recovery")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (first, second, total) =
        (r.getAs[Long]("n_first"), r.getAs[Long]("n_second"), r.getAs[Long]("total"))
      // run 2 must process exactly the NEW file: equal to run 1's
      // counts (reprocessing doubles it; losing the file zeroes it)
      assert(first > 0)
      assert(second == first, s"recovery broke exactly-once: $r")
      assert(total == 2 * first)
    }
  }

  test("eng_stream_backfill paces the backlog into bounded batches, totals exact") {
    val dir = "/root/testdata/sf0.001"
    val rows = EngineOps.queries("eng_stream_backfill")(spark, dir).collect()
    assert(rows.nonEmpty)
    // pacing: 6 backlog files under maxFilesPerTrigger=2 → 3 batches,
    // and no single batch admitted the whole backlog
    rows.foreach { r =>
      assert(r.getAs[Long]("n_batches") == 3L, r.toString)
      assert(r.getAs[Boolean]("paced"), r.toString)
    }
    // pacing changes batch boundaries, never results
    val batch = Tables.table(spark, dir, "events")
      .groupBy(org.apache.spark.sql.functions.col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val streamed = rows.map(r =>
      r.getAs[String]("event_type") -> r.getAs[Long]("n_rows")).toMap
    assert(streamed == batch, s"paced totals diverged: $streamed vs $batch")
  }
}
