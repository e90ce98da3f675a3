package graft

import org.scalatest.funsuite.AnyFunSuite

/** The physical-control surface a perf engineer reaches for at 100 TB:
  * join-strategy hints and explicit distribution. Plan-shape
  * assertions in the reference's IR-assertion style
  * (/root/reference/mlir_compiler/test_partitioner.py:10-50) — the
  * hints are the Spark analog of the reference's manual CPU/CIM
  * placement overrides (codegen_cim.py:154-160). */
class PlanHintsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def plan(sql: String): String = {
    Tables.register(spark, dir)
    spark.sql(sql).queryExecution.executedPlan.toString
  }

  test("BROADCAST hint forces a broadcast join") {
    val p = plan("""SELECT /*+ BROADCAST(nation) */ n_name, count(*) AS c
                   |FROM customer JOIN nation ON c_nationkey = n_nationkey
                   |GROUP BY n_name""".stripMargin)
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("MERGE hint forces a sort-merge join even under the broadcast threshold") {
    val p = plan("""SELECT /*+ MERGE(nation) */ n_name, count(*) AS c
                   |FROM customer JOIN nation ON c_nationkey = n_nationkey
                   |GROUP BY n_name""".stripMargin)
    assert(p.contains("SortMergeJoin"), p.take(600))
  }

  test("SHUFFLE_HASH hint forces a shuffled hash join") {
    val p = plan("""SELECT /*+ SHUFFLE_HASH(nation) */ n_name, count(*) AS c
                   |FROM customer JOIN nation ON c_nationkey = n_nationkey
                   |GROUP BY n_name""".stripMargin)
    assert(p.contains("ShuffledHashJoin"), p.take(600))
  }

  test("DISTRIBUTE BY plans a hash exchange on the key") {
    val p = plan("SELECT o_custkey, o_totalprice FROM orders DISTRIBUTE BY o_custkey")
    assert(p.contains("hashpartitioning(o_custkey"), p.take(600))
  }

  test("qx13/qj11: EXISTS decorrelates to semi+anti joins, argmax is one aggregate") {
    // EXISTS / NOT EXISTS must become hash joins on the correlation
    // key, never per-row subquery execution
    val pj = plan(QueryInventory.qj11.sparkSql)
    assert(pj.contains("LeftSemi"), pj.take(800))
    assert(pj.contains("LeftAnti"), pj.take(800))
    assert(!pj.contains("CartesianProduct"), pj.take(800))
    // max_by/min_by/any_value fold into ONE aggregate with a
    // map-side partial stage (max_by's ordering buffer plans as
    // SortAggregate), never a window over the whole table
    val px = plan(QueryInventory.qx13.sparkSql)
    assert(px.contains("Aggregate"), px.take(800))
    assert(px.contains("partial_max_by"), px.take(800))
    assert(!px.contains("Window"), px.take(800))
  }

  test("qj15/qj16: TPC-H star + double-subquery flavors plan the scale shapes") {
    // Q3 flavor: the top-10 must run as TakeOrderedAndProject (never a
    // global sort materialization) over broadcast dimension joins
    val p15 = plan(QueryInventory.qj15.sparkSql)
    assert(p15.contains("TakeOrderedAndProject"), p15.take(800))
    assert(p15.contains("BroadcastHashJoin"), p15.take(800))
    // Q21 flavor: BOTH correlated subqueries against lineitem must
    // decorrelate to hash joins on l_orderkey — semi for EXISTS, anti
    // for NOT EXISTS — with no nested-loop anywhere
    val p16 = plan(QueryInventory.qj16.sparkSql)
    assert(p16.contains("LeftSemi"), p16.take(800))
    assert(p16.contains("LeftAnti"), p16.take(800))
    assert(!p16.contains("BroadcastNestedLoop") && !p16.contains("CartesianProduct"),
      p16.take(800))
  }

  test("REPARTITION hint controls the shuffle partition count") {
    val p = plan("SELECT /*+ REPARTITION(7) */ o_orderkey FROM orders")
    assert(p.contains("RoundRobinPartitioning(7)"), p.take(600))
  }

  test("selective fact-fact join injects a runtime Bloom filter on the probe side") {
    // the other half of the 100 TB join story: when one side carries a
    // selective predicate, the optimizer must build a Bloom filter
    // from it and semi-filter the probe side's scan — at scale this
    // skips most of the big side before the shuffle. Thresholds are
    // adjusted for test-sized data (creation side must be allowed at
    // any size, probe side has no minimum scan size); broadcast is
    // disabled so the shuffle-join path plans.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      Tables.register(spark, dir)
      val p = spark.sql(
        """SELECT l_orderkey, o_totalprice FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |WHERE o_totalprice > 400000""".stripMargin)
        .queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter_agg"), p.take(900))
      assert(p.contains("might_contain"), p.take(900))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // the 100 TB hot-key story: one key owning most of a join side
    // must not serialize into one straggler task — AQE's
    // OptimizeSkewedJoin splits the oversized partition. Skew is
    // synthesized (one key with 50k rows vs 127 keys with ~40), the
    // split thresholds are lowered to match the test's data volume,
    // and broadcast is disabled so a real shuffle join plans.
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, lit, when}
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 55000)
        .select((when($"id" < 50000, 7L).otherwise($"id" % 128)).as("k"),
          concat(lit("padpadpadpadpadpadpadpadpadpad-"), $"id").as("payload"))
      val right = spark.range(0, 128).select($"id".as("k"), ($"id" * 2).as("v"))
      // aggregate OVER the payload so column pruning can't strip the
      // padding that makes the hot partition's bytes skewed; the
      // aggregate is GLOBAL (partition-local partials, no required
      // distribution) — a groupBy on the join key would veto the
      // split, since splitting breaks the join's output partitioning
      // and AQE won't add a shuffle to compensate by default
      val joined = left.join(right, "k")
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.length($"payload")).as("bytes"))
      joined.collect() // AQE finalizes the plan only on execution
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p.take(1200))
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
