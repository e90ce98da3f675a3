package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hive-compatibility layer: databases, managed and external tables,
  * and DDL resolve through the Hive metastore catalog. */
class HiveCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("session runs on the hive catalog implementation") {
    assert(spark.conf.get("spark.sql.catalogImplementation") == "hive")
  }

  test("database + managed table DDL/DML round-trip through the metastore") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cat")
    spark.sql("DROP TABLE IF EXISTS graft_cat.managed_t")
    spark.sql("CREATE TABLE graft_cat.managed_t (k INT, v STRING) USING parquet")
    spark.sql("INSERT INTO graft_cat.managed_t VALUES (1, 'a'), (2, 'b')")
    val rows = spark.sql("SELECT k, v FROM graft_cat.managed_t ORDER BY k").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "a"), (2, "b")))
    assert(spark.catalog.listTables("graft_cat").collect().exists(_.name == "managed_t"))
  }

  test("external table over the driver parquet resolves and aggregates") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cat")
    spark.sql("DROP TABLE IF EXISTS graft_cat.region_ext")
    spark.sql(
      """CREATE TABLE graft_cat.region_ext USING parquet
        |LOCATION '/root/testdata/sf0.001/region.parquet'""".stripMargin)
    val n = spark.sql("SELECT count(*) AS n FROM graft_cat.region_ext")
      .collect().head.getLong(0)
    assert(n == 5)
  }

  test("CTAS and persisted views resolve through the metastore") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cat")
    spark.sql("DROP VIEW IF EXISTS graft_cat.top_regions")
    spark.sql("DROP TABLE IF EXISTS graft_cat.ctas_t")
    // CTAS: table materialized from a query in one DDL statement
    spark.sql(
      """CREATE TABLE graft_cat.ctas_t USING parquet AS
        |SELECT r_regionkey AS k, r_name AS name
        |FROM parquet.`/root/testdata/sf0.001/region.parquet`""".stripMargin)
    assert(spark.table("graft_cat.ctas_t").count() == 5)
    // persisted (metastore-backed) view over the CTAS table
    spark.sql(
      """CREATE VIEW graft_cat.top_regions AS
        |SELECT name FROM graft_cat.ctas_t WHERE k >= 2""".stripMargin)
    assert(spark.catalog.listTables("graft_cat").collect()
      .exists(t => t.name == "top_regions" && t.tableType == "VIEW"))
    assert(spark.sql("SELECT count(*) FROM graft_cat.top_regions")
      .head.getLong(0) == 3)
    // the view's definition round-trips out of the metastore
    val ddl = spark.sql("SHOW CREATE TABLE graft_cat.top_regions").head.getString(0)
    assert(ddl.contains("CREATE VIEW") && ddl.contains("ctas_t"), ddl)
  }

  test("partitioned DDL: insert, SHOW PARTITIONS, DROP PARTITION, MSCK, ADD COLUMNS") {
    val dir = "/root/testdata/sf0.001"
    val out = EngineOps.queries("eng_hive_partitioned_ddl")(TestSpark.spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ev = Tables.table(spark, dir, "events")
      .withColumn("day", date_format(to_date(col("ts")), "yyyy-MM-dd"))
    val perDay = ev.groupBy(col("day")).count().orderBy(col("day")).limit(3)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val Seq(n0, n1, n2) = perDay.map(_._2).toSeq
    assert(out("1_insert_2_days") == (2L, n0 + n1, 0L))
    assert(out("2_drop_partition") == (1L, n0, 0L))
    // out-of-band files exist on disk but the catalog can't see them yet
    assert(out("3_outofband_unseen") == (1L, n0, 0L))
    // MSCK reconciles: the landed day appears with its full row count
    assert(out("4_msck_discovered") == (2L, n0 + n2, 0L))
    // schema evolution: after ALTER TABLE ADD COLUMNS + inserting the
    // middle day under the widened schema, only that day's rows carry
    // quality — both pre-ALTER partitions read NULL
    assert(out("5_add_column_insert") == (3L, n0 + n1 + n2, n1))
    // and the discovered partition is queryable with partition pruning
    val d2 = perDay(2)._1
    val pruned = spark.sql(
      s"SELECT count(*) FROM graft_cat.events_part WHERE day = '$d2'")
      .collect().head.getLong(0)
    assert(pruned == n2)
    // per-partition read-back across the schema boundary: exactly the
    // post-ALTER day has quality == count(*), the old days read 0
    val byDay = spark.sql(
      """SELECT day, count(quality) AS q, count(*) AS n
        |FROM graft_cat.events_part GROUP BY day ORDER BY day""".stripMargin)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val d0 = perDay(0)._1
    val d1 = perDay(1)._1
    assert(byDay(d0) == (0L, n0))
    assert(byDay(d1) == (n1, n1))
    assert(byDay(d2) == (0L, n2))
  }

  test("ANALYZE TABLE stats flip the filtered dim join to broadcast (eng_cbo_stats)") {
    val dir = "/root/testdata/sf0.001"
    val rows = EngineOps.queries("eng_cbo_stats")(TestSpark.spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val (rc1, ndv1, plan1, order1, jr1, rev1, nre1) = rows("1_no_stats")
    val (rc2, ndv2, plan2, order2, jr2, rev2, nre2) = rows("2_analyzed_cbo")
    // without statistics the planner sees no reason to broadcast the
    // filtered dim (threshold pinned under its file-size estimate)
    assert(rc1 == -1L && ndv1 == -1L)
    assert(plan1 == "shuffled")
    // ANALYZE + CBO: exact rowCount lands in the catalog, NDV-based
    // filter selectivity shrinks the dim under the same threshold,
    // and the identical query now plans a broadcast join
    val nCustomer = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(rc2 == nCustomer)
    assert(ndv2 > 0)
    assert(plan2 == "broadcast")
    // join REORDER: stats-blind keeps the written 3-table order;
    // CBO reorders by estimated cardinality to join the dims first
    assert(order1 == "orders_cbo,customer_cbo,nation_cbo", order1)
    assert(order2 == "customer_cbo,nation_cbo,orders_cbo", order2)
    // the flips are physical only: identical results on both probes
    assert(jr1 == jr2 && jr1 > 0)
    assert(rev1 == rev2)
    assert(nre1 == nre2 && nre1 > 0)
    // the session's cbo/threshold confs are restored after the entry
    assert(spark.conf.get("spark.sql.cbo.enabled") == "false")
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "10485760b"
      || spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "10MB")
  }

  test("histogram stats flip the skewed-tail join to broadcast (eng_cbo_histogram)") {
    val rows = EngineOps.queries("eng_cbo_histogram")(
        TestSpark.spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getString(3),
          r.getLong(4), r.getLong(5)))).toMap
    val (h1, bins1, plan1, jr1, vc1) = rows("1_basic_stats")
    val (h2, bins2, plan2, jr2, vc2) = rows("2_histogram")
    // basic column stats assume value is uniform over [min, max]:
    // the mid-range tail filter is estimated at ~50% and the join
    // stays shuffled under the pinned threshold
    assert(!h1 && bins1 == 0L)
    assert(plan1 == "shuffled")
    // the equi-height histogram sees the exponential shape: the same
    // filter estimate collapses and the SAME query plans a broadcast
    assert(h2 && bins2 > 0L)
    assert(plan2 == "broadcast")
    // the flip is physical only: identical results on both probes
    assert(jr1 == jr2 && jr1 > 0)
    assert(vc1 == vc2)
    // histogram conf restored after the entry
    assert(spark.conf.get("spark.sql.statistics.histogram.enabled") == "false")
  }
}
