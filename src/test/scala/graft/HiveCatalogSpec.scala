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
}
