package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + plan-shape checks over the declared inventory at sf0.001,
  * in the reference's plan-assertion style
  * (/root/reference/mlir_compiler/test_partitioner.py:10-50 asserts
  * on IR structure, not just results). */
class InventorySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("inventory has no duplicate names and every oracle key exists") {
    val names = QueryInventory.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns the 6 pricing-summary groups") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 6)
    assert(rows.head.schema.fieldNames.contains("sum_qty"))
  }

  test("representative queries return rows at sf0.001") {
    val expectNonEmpty = Seq("qf1_project_filter", "qa1_pricing_summary",
      "qj1_star_join", "qw1_ranking", "qt2_topk_per_group", "qu1_union_all",
      "qv1_vector_norm", "ql1_text_stats", "qs1_tumbling_window")
    expectNonEmpty.foreach { n =>
      val c = SparkEntry.queries(n)(spark, dir).count()
      assert(c > 0, s"$n returned no rows")
    }
  }

  test("filters are pushed into the parquet scan (qf1)") {
    Tables.register(spark, dir)
    val plan = spark.sql(QueryInventory.qf1.sparkSql)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan.take(500))
    assert(plan.contains("l_returnflag"), "filter column missing from scan")
  }

  test("star join broadcasts the small dimensions (qj1)") {
    Tables.register(spark, dir)
    val plan = spark.sql(QueryInventory.qj1.sparkSql)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("scan prunes columns to the projection (qf1 reads 3 columns)") {
    Tables.register(spark, dir)
    val plan = spark.sql(QueryInventory.qf1.sparkSql)
      .queryExecution.executedPlan.toString
    // ReadSchema should mention only projected/filtered columns
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && !read.contains("l_extendedprice"), read)
  }

  test("top-k per group uses the window-group-limit pushdown (qt2)") {
    Tables.register(spark, dir)
    val plan = spark.sql(QueryInventory.qt2.sparkSql)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("mixture resampling ranks at most the literal cap per stratum (ql8)") {
    Tables.register(spark, dir)
    val plan = spark.sql(QueryInventory.ql8.sparkSql)
      .queryExecution.executedPlan.toString
    // the column-valued quota alone would block the pushdown; the
    // redundant literal cap restores it
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("stratified sample scan reads only the needed columns (ql7)") {
    Tables.register(spark, dir)
    val plan = spark.sql(QueryInventory.ql7.sparkSql)
      .queryExecution.executedPlan.toString
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("text") && read.contains("n_chars") && !read.contains("doc_id"), read)
  }

  test("stratified sample is partition-invariant (ql7 semantics)") {
    import org.apache.spark.sql.functions._
    Tables.register(spark, dir)
    val docs = spark.table("documents")
    val pred = substring(md5(col("text")), 1, 1).isin("0", "1", "2", "3", "4")
    val a = docs.repartition(3).filter(pred).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = docs.repartition(11).filter(pred).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("mixture quotas are honored exactly (ql8 semantics)") {
    import org.apache.spark.sql.functions._
    Tables.register(spark, dir)
    val sel = spark.sql(QueryInventory.ql8.sparkSql)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val stratum = spark.table("documents").groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    stratum.foreach { case (src, n) =>
      val quota = 5L + (src.drop(3).toInt % 7)
      assert(sel.getOrElse(src, 0L) == math.min(quota, n),
        s"$src: sel=${sel.get(src)} quota=$quota stratum=$n")
    }
  }

  test("contract results are invariant to shuffle partitioning (fp determinism sweep)") {
    // the oracle gate depends on every query being deterministic under
    // any partitioning (fp summation order, row order): run the WHOLE
    // contract under two different shuffle widths and require
    // identical results — the end-to-end check of the §2.9 discipline
    Tables.register(spark, dir)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    // run through SparkEntry.queries so impl overrides (the shipped
    // path — e.g. ql11's kernel) are swept, not just the SQL spelling
    val fns = SparkEntry.queries
    def runAll(): Map[String, Seq[String]] =
      QueryInventory.all.map { q =>
        q.name -> fns(q.name)(spark, dir).collect().map(_.toString).toSeq
      }.toMap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val a = runAll()
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val b = runAll()
      val diff = QueryInventory.all.map(_.name).filter(n => a(n) != b(n))
      assert(diff.isEmpty, s"partitioning-sensitive results in: $diff")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("engine-side results are invariant to shuffle partitioning (eng fp sweep)") {
    // the eng_* entries have no DuckDB oracle, so partitioning-order
    // nondeterminism (fp summation, unstable top-k ties) would
    // otherwise go unnoticed — the ADVICE-r4 VecSumAgg/lloydStep class
    // of bug. The two file-stream entries are excluded: their
    // determinism is asserted by their own stream==batch + rows>0
    // specs, and micro-batch replay under a different shuffle width is
    // exercised there.
    Tables.register(spark, dir)
    val skip = Set("eng_streaming_replay", "eng_stream_join")
    val names = EngineOps.queries.keys.toSeq.filterNot(skip).sorted
    val fns = SparkEntry.queries
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def runAll(): Map[String, Seq[String]] =
      names.map(n => n -> fns(n)(spark, dir).collect().map(_.toString).toSeq).toMap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val a = runAll()
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val b = runAll()
      val diff = names.filter(n => a(n) != b(n))
      assert(diff.isEmpty, s"partitioning-sensitive results in: $diff")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("every impl override returns exactly its SQL spelling's rows") {
    // the contract: `impl` is a faster SPELLING of sparkSql, never a
    // semantic fork — compare collected rows for every overridden query
    Tables.register(spark, dir)
    val offenders = QueryInventory.all.filter(_.impl.isDefined).flatMap { q =>
      val viaImpl = q.impl.get(spark, dir).collect().map(_.toString).toSeq
      val viaSql = spark.sql(q.sparkSql).collect().map(_.toString).toSeq
      if (viaImpl == viaSql) None else Some(q.name)
    }
    assert(offenders.isEmpty, s"impl != sparkSql for: $offenders")
  }

  test("qw5 two-phase ntile (gate forced on) equals the SQL window exactly") {
    // the default-gated impl path at test SFs is the SQL plan itself
    // (covered by the impl==sql sweep above); this pins the TWO-PHASE
    // spelling — range partition + local rank + offset merge +
    // closed-form ntile/percent_rank — to the window's exact rows,
    // including the ntile remainder-bucket arithmetic
    Tables.register(spark, dir)
    spark.conf.set(QueryInventory.TwoPhaseNtileMinBytesKey, "0")
    try {
      val viaImpl = QueryInventory.qw5.impl.get(spark, dir)
      // the gate must actually have routed to the two-phase plan: its
      // only window is the pid-partitioned local row_number — the
      // global ntile/percent_rank window (the "No Partition Defined"
      // single-partition sort) is gone, replaced by closed-form math
      val plan = viaImpl.queryExecution.executedPlan.toString
      assert(!plan.contains("ntile(") && !plan.contains("percent_rank()"),
        "gate-forced qw5 impl still planned the global window:\n" + plan.take(800))
      assert(plan.contains("row_number()"), plan.take(800))
      val a = viaImpl.collect().map(_.toString).toSeq
      val b = spark.sql(QueryInventory.qw5.sparkSql).collect().map(_.toString).toSeq
      assert(a == b)
    } finally spark.conf.unset(QueryInventory.TwoPhaseNtileMinBytesKey)
  }

  test("no contract query plans a cartesian product (beyond declared tiny probes)") {
    Tables.register(spark, dir)
    // declared exceptions: qj6 is the 5×25 cross-join contract query
    // itself; 1-row probe attachments plan as BroadcastNestedLoopJoin,
    // which is fine and not matched here
    val allowed = Set("qj6_cross_join")
    val offenders = QueryInventory.all.filterNot(q => allowed(q.name)).flatMap { q =>
      val plan = spark.sql(q.sparkSql).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"cartesian product in: $offenders")
  }

  test("every contract query obeys the determinism discipline (total ORDER BY)") {
    // single-row global aggregates are deterministic without a sort
    val singleRow = Set("qj2_broadcast_join", "ql2_exact_dedup", "qs6_funnel")
    // the FINAL clause must be an outer ORDER BY — an ORDER BY that
    // only appears inside OVER() or WITHIN GROUP doesn't order rows
    def hasOuterOrderBy(sql: String): Boolean = {
      val u = sql.toUpperCase
      val last = u.lastIndexOf("ORDER BY")
      last >= 0 && last > u.lastIndexOf(" OVER") && last > u.lastIndexOf("WITHIN GROUP")
    }
    val offenders = QueryInventory.all.filterNot(q => singleRow(q.name)).flatMap { q =>
      val missing = !hasOuterOrderBy(q.sparkSql) ||
        q.oracleSql.exists(o => !hasOuterOrderBy(o))
      if (missing) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"no outer ORDER BY in: $offenders")
  }

  test("repetition kernel impl is a shuffle-free projection (ql11)") {
    Tables.register(spark, dir)
    val plan = QueryInventory.ql11.impl.get(spark, dir)
      .queryExecution.executedPlan.toString
    // the only exchange allowed is the final total-order sort's range
    // partitioning — no hash exchange from any groupBy survives
    assert(!plan.contains("hashpartitioning"), plan.take(1200))
    assert(plan.contains("repetition_stats"), plan.take(1200))
  }

  test("native session_window equals the lag+running-sum spelling (qs5)") {
    Tables.register(spark, dir)
    val native = spark.sql(QueryInventory.qs5.sparkSql).collect()
    // same derivation the DuckDB oracle runs, spelled in Spark (>=
    // boundary: session_window merges only while next_start < end)
    val lag = spark.sql(
      """WITH d AS (
        |  SELECT user_id, event_id, unix_micros(ts) AS tus,
        |         lag(unix_micros(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tus
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, tus,
        |         sum(CASE WHEN prev_tus IS NULL OR tus - prev_tus >= 1800000000 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d)
        |SELECT user_id, min(tus) AS ss, count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id NULLS FIRST, ss NULLS FIRST, n_events NULLS FIRST""".stripMargin).collect()
    assert(native.length == lag.length)
    native.zip(lag).foreach { case (a, b) => assert(a == b) }
  }

  test("ql15 prefix filtering is lossless (equals the quadratic spelling)") {
    Tables.register(spark, dir)
    val filtered = spark.sql(QueryInventory.ql15.sparkSql).collect()
    // same semantics with NO prefix filter: every token joins
    val quadratic = spark.sql(
      """WITH w AS (SELECT doc_id, array_distinct(split(text, ' ')) AS toks
        |           FROM documents WHERE doc_id < 150),
        |tok AS (SELECT doc_id, explode(toks) AS token FROM w),
        |cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |common AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
        |           FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |           GROUP BY a.doc_id, b.doc_id)
        |SELECT da, db, round(CAST(c AS DOUBLE) / (ca.n + cb.n - c), 4) AS jaccard
        |FROM common JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
        |WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.9
        |ORDER BY da NULLS FIRST, db NULLS FIRST, jaccard NULLS FIRST""".stripMargin).collect()
    assert(filtered.length == quadratic.length && filtered.nonEmpty)
    filtered.zip(quadratic).foreach { case (a, b) => assert(a == b) }
  }

  test("fuzzy join blocks on the equi-key; outlier stats broadcast (qj12, qa17)") {
    Tables.register(spark, dir)
    val fuzzy = spark.sql(QueryInventory.qj12.sparkSql)
      .queryExecution.executedPlan.toString
    // the brand equi-key must drive a hash-based join (per-block pair
    // scan), never a nested-loop over all parts
    assert(fuzzy.contains("BroadcastHashJoin") || fuzzy.contains("SortMergeJoin") ||
      fuzzy.contains("ShuffledHashJoin"), fuzzy.take(800))
    assert(!fuzzy.contains("BroadcastNestedLoopJoin"), fuzzy.take(800))
    val outliers = spark.sql(QueryInventory.qa17.sparkSql)
      .queryExecution.executedPlan.toString
    // the 5-row (mu, sd) frame broadcasts back onto the fact scan
    assert(outliers.contains("BroadcastHashJoin"), outliers.take(800))
  }

  test("sequence packing conserves tokens (ql9 invariant)") {
    import org.apache.spark.sql.functions._
    Tables.register(spark, dir)
    val packed = spark.sql(QueryInventory.ql9.sparkSql)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("total_tokens")).toMap
    val direct = spark.table("documents")
      .groupBy("source").agg(sum(size(split(col("text"), " "))).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(packed == direct && packed.nonEmpty)
  }
}
