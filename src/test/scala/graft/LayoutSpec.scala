package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Salting
import graft.sources.TableLayout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("day-partitioned layout prunes partitions for date predicates") {
    Tables.register(spark, "/root/testdata/sf0.001")
    val tmp = java.nio.file.Files.createTempDirectory("graft_events_part").toString
    TableLayout.writeEventsByDay(spark.table("events"), tmp)
    val day = "2024-01-05"
    val pruned = TableLayout.readDay(spark, tmp, day)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"),
      plan.take(800))
    val expected = spark.table("events")
      .filter(to_date(col("ts")) === lit(day)).count()
    assert(pruned.count() == expected)
    assert(expected > 0)
  }

  test("codec round-trip: every parquet codec preserves the data") {
    val rows = EngineOps.queries("eng_codec_roundtrip")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("gzip", "lz4", "snappy", "zstd"))
    assert(rows.map(_.getLong(1)).distinct.length == 1)   // same row count back
    assert(rows.map(_.getLong(2)).distinct.length == 1)   // same content hash
    assert(rows.map(_.getDouble(3)).distinct.length == 1) // same value sum
    assert(rows.forall(_.getLong(4) > 0))                 // real files on disk
  }

  test("compaction bin-packs small files losslessly (eng_compaction)") {
    val rows = EngineOps.queries("eng_compaction")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("compacted", "fragmented"))
    val byStage = rows.map(r => r.getString(0) -> r).toMap
    // fragmented side really is fragmented; compaction reduces files
    assert(byStage("fragmented").getInt(1) == 64)
    assert(byStage("compacted").getInt(1) < 64)
    // lossless: identical count, content hash, and value sum
    assert(rows.map(_.getLong(2)).distinct.length == 1)
    assert(rows.map(_.getLong(3)).distinct.length == 1)
    assert(rows.map(_.getDouble(4)).distinct.length == 1)
  }

  test("source round-trip: json/csv/xml/parquet/orc each re-read losslessly") {
    val rows = EngineOps.queries("eng_source_roundtrip")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("csv", "json", "orc", "parquet", "source", "xml"))
    assert(rows.map(_.getLong(1)).distinct.length == 1)   // same row count back
    assert(rows.map(_.getLong(2)).distinct.length == 1)   // same content hash
    assert(rows.map(_.getDouble(3)).distinct.length == 1) // same value sum
  }

  test("Z-ordered layout skips row groups on both dimensions (eng_zorder_scan)") {
    val rows = EngineOps.queries("eng_zorder_scan")(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    // same hits + value sums from both layouts, for both predicates
    for (pred <- Seq("user_eq", "time_range")) {
      val (nL, sL, _) = rows(("linear", pred))
      val (nZ, sZ, _) = rows(("zorder", pred))
      assert(nL == nZ && sL == sZ && nL > 0, s"$pred: $nL/$sL vs $nZ/$sZ")
    }
    val total = Tables.table(spark, "/root/testdata/sf0.01", "events").count()
    // user-only predicate: the time-sorted layout cannot skip (the
    // user appears all month) but the Z layout must
    val userZ = rows(("zorder", "user_eq"))._3
    val userL = rows(("linear", "user_eq"))._3
    assert(userZ < userL, s"zorder scanned $userZ >= linear $userL")
    assert(userZ <= total / 2, s"zorder user scan pruned nothing: $userZ of $total")
    // time-only predicate: the time-sorted layout must skip most rows
    val timeL = rows(("linear", "time_range"))._3
    assert(timeL <= total / 2, s"linear time scan pruned nothing: $timeL of $total")
  }

  test("IVF cell layout prunes the scan to nProbe directories (eng_ivf_pruned_scan)") {
    val rows = EngineOps.queries("eng_ivf_pruned_scan")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (fFull, rFull, _, cosFull) = rows("full")
    val (fPruned, rPruned, _, cosPruned) = rows("pruned")
    // partition pruning happened at the FILE level, before any IO
    assert(fPruned <= 4, s"pruned scan read $fPruned files, expected <= nProbe=4")
    assert(fPruned < fFull, s"no file skipping: $fPruned vs $fFull files")
    assert(rPruned < rFull, s"no row reduction: $rPruned vs $rFull rows")
    // the pruned result is a genuine top-k (can only miss, never beat)
    assert(cosPruned <= cosFull + 1e-9 && cosPruned > 0)
  }

  test("SQ8 at-rest layout shrinks bytes and keeps the exact top-10 (eng_sq8_layout)") {
    val rows = EngineOps.queries("eng_sq8_layout")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getString(3))).toMap
    val (nF, ratioF, topF) = rows("float")
    val (nS, ratioS, topS) = rows("sq8")
    assert(nF == nS && nF > 0)
    assert(ratioF == 1.0)
    // int8 codes at 1 byte/dim: on-disk footprint well under half the
    // float layout (raw ratio would be ~0.25 + scale/id overhead)
    assert(ratioS < 0.5, s"sq8 layout not compact: ratio $ratioS")
    // candidates-from-codes + exact rescore reproduces the float-scan
    // top-10 exactly on this corpus
    assert(topS == topF, s"sq8 path diverged: $topS vs $topF")
  }

  test("dynamic partition pruning reads only the dim's surviving days (eng_dpp_scan)") {
    val rows = EngineOps.queries("eng_dpp_scan")(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (fFull, rFull, nFull, _) = rows("full")
    val (fDpp, rDpp, nDpp, _) = rows("dpp")
    // the runtime dim filter pruned fact FILES, not just rows
    assert(fDpp < fFull, s"no file pruning: $fDpp vs $fFull files")
    assert(rDpp < rFull, s"no scan reduction: $rDpp vs $rFull rows")
    assert(nDpp > 0 && nDpp < nFull)
    // and the scan metric matches the semantic selectivity: only
    // days with dayofmonth % 10 == 3 survive (3 of 31 in January)
    assert(fDpp <= fFull * 4 / 31 + 1, s"pruned file census too large: $fDpp of $fFull")
  }

  test("SQL UDF inlines into the plan and matches the direct spelling (eng_sql_udf)") {
    val rows = EngineOps.queries("eng_sql_udf")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getString(0)).toSeq.sorted == Seq("high", "low", "mid"))
    rows.foreach { r =>
      // the UDF body must land in the optimized plan as plain
      // expressions — no ScalaUDF codegen boundary on the hot path
      assert(r.getAs[Boolean]("inlined"), "SQL UDF did not inline")
      assert(r.getAs[Boolean]("matches_direct"))
      assert(r.getAs[Boolean]("tvf_matches"))
      assert(r.getAs[Long]("n_events") > 0)
      assert(r.getAs[Long]("tvf_rows") > 0)
    }
  }

  test("runtime bloom filter prunes fact rows before the shuffle (eng_runtime_filter)") {
    val rows = EngineOps.queries("eng_runtime_filter")(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (b1, fact1, jr1, rev1) = rows("1_filter_off")
    val (b2, fact2, jr2, rev2) = rows("2_bloom_injected")
    // rule off: no might_contain in the plan, every fact row shuffles
    assert(!b1)
    // rule on: the bloom predicate is injected and MEASURED to drop
    // fact rows before the exchange — never below the true match count
    assert(b2)
    assert(fact2 > 0 && fact2 < fact1,
      s"bloom filter pruned nothing: $fact2 of $fact1 fact rows")
    assert(fact2 >= jr2)
    // a bloom filter admits all true matches: identical join results
    assert(jr1 == jr2 && jr1 > 0)
    assert(rev1 == rev2)
  }

  test("AQE splits the measured-skewed join partition (eng_aqe_skew)") {
    val rows = EngineOps.queries("eng_aqe_skew")(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getLong(3), r.getLong(4)))).toMap
    val (det1, spl1, jr1, wc1) = rows("1_skew_off")
    val (det2, spl2, jr2, wc2) = rows("2_skew_split")
    // rule off: the hub partition runs as one straggler, unrepaired
    assert(!det1 && !spl1)
    // rule on: skew DETECTED from runtime map-output sizes and SPLIT
    assert(det2, "AQE did not flag the hub partition as skewed")
    assert(spl2, "AQE flagged skew but applied no splits")
    // splitting is a physical re-read: identical join results
    assert(jr1 == jr2 && jr1 > 0)
    assert(wc1 == wc2)
  }

  test("the duplicated aggregate exchange materializes once (eng_exchange_reuse)") {
    val rows = EngineOps.queries("eng_exchange_reuse")(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val (ex1, ru1, nm1, mc1, tc1) = rows("1_reuse_off")
    val (ex2, ru2, nm2, mc2, tc2) = rows("2_reuse_on")
    // rule off: the per-supplier aggregate's exchange runs twice
    assert(ru1 == 0)
    // rule on: the duplicate becomes a ReusedExchangeExec — strictly
    // fewer exchanges actually execute
    assert(ru2 >= 1, "no ReusedExchangeExec in the reuse-on plan")
    assert(ex2 < ex1, s"reuse did not reduce executed exchanges: $ex2 vs $ex1")
    // reading the same shuffle files: identical results
    assert(nm1 == nm2 && nm1 > 0)
    assert(mc1 == mc2 && tc1 == tc2 && tc1 > 0)
  }

  test("salted two-phase aggregation equals the direct group-by") {
    Tables.register(spark, "/root/testdata/sf0.001")
    val ev = spark.table("events")
    val direct = ev.groupBy(col("event_type"))
      .agg(sum(col("value")).as("sum_v"), count(lit(1)).as("cnt"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .collect().map(r => r.getString(0) ->
        (math.round(r.getDouble(1) * 100), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Salting.saltedStats(ev, "event_type", "value", "event_id", salts = 8)
      .collect().map(r => r.getString(0) ->
        (math.round(r.getDouble(1) * 100), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted == direct)
  }

  test("salted join equals the plain equi-join") {
    Tables.register(spark, "/root/testdata/sf0.001")
    val ev = spark.table("events")
    val dim = ev.select(col("event_type")).distinct()
      .withColumn("w", pmod(xxhash64(col("event_type")), lit(97L)))
    val plain = ev.join(dim, "event_type")
    val salted = Salting.saltedJoin(ev, dim, "event_type", "event_id", salts = 8)
    // Goldens.checksum is column-sorted and row-order/partition
    // independent — frame equality without materializing an order
    assert(Goldens.checksum(salted) == Goldens.checksum(plain))
    assert(plain.count() == ev.count())   // baseline join is 1:1
    assert(salted.count() == ev.count()) // replication added no rows
  }

  test("mergeSchema read surfaces the union schema with nulls for legacy files") {
    val dir = "/root/testdata/sf0.001"
    val out = EngineOps.queries("eng_schema_merge")(spark, dir).collect()
    val ev = Tables.table(spark, dir, "events")
    // legacy (no-quality) rows are exactly the even-event_id batch
    val legacyByType = ev.filter(col("event_id") % 2 === 0)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_legacy") == legacyByType(r.getAs[String]("event_type")))
      assert(r.getAs[Double]("quality_sum") > 0.0) // new column populated
    }
  }

  test("dynamic partition overwrite restates one day and leaves siblings intact") {
    val dir = "/root/testdata/sf0.001"
    val out = EngineOps.queries("eng_partition_overwrite")(spark, dir).collect()
      .map(r => r.getAs[String]("day") ->
        (r.getAs[Long]("n"), r.getAs[Double]("sum_v"))).toMap
    val ev = Tables.table(spark, dir, "events")
    val orig = ev.groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("s")).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getDouble(2))).toMap
    val day0 = orig.keys.min
    assert(out.keySet == orig.keySet)
    orig.foreach { case (d, (n, s)) =>
      val (on, os) = out(d)
      assert(on == n, s"row count changed for $d")
      if (d == day0) assert(math.abs(os - 2 * s) < 0.01, s"target day not doubled: $os vs ${2 * s}")
      else assert(math.abs(os - s) < 0.01, s"sibling day $d was touched: $os vs $s")
    }
  }

  test("CACHE TABLE serves consumers from InMemoryTableScan (eng_cache_table)") {
    val rows = EngineOps.queries("eng_cache_table")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1_uncached", "2_cached"))
    val byStage = rows.map(r => r.getString(0) -> r).toMap
    val (un, ca) = (byStage("1_uncached"), byStage("2_cached"))
    // uncached: every consumer re-scans parquet, no memory scans
    assert(un.getLong(1) >= 2 && un.getLong(2) == 0, s"uncached census: $un")
    // cached: consumers read ONLY the InMemoryRelation — zero file scans
    assert(ca.getLong(1) == 0 && ca.getLong(2) >= 2, s"cached census: $ca")
    assert(ca.getBoolean(3), "catalog.isCached was false")
    assert(ca.getBoolean(6), "cached results diverged from uncached")
    assert(ca.getLong(4) == un.getLong(4) && ca.getLong(5) == un.getLong(5))
    assert(un.getLong(4) > 0 && un.getLong(5) > 0)
    // the entry must leave the catalog clean
    assert(!spark.catalog.isCached("events"))
  }
}
