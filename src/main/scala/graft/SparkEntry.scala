package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every oracle-checked operator of SURVEY §2.9 is an entry in
  * `queries` (run verbatim via `spark.sql` over the registered
  * tables) with a DuckDB spelling in `oracleSql`. Engine-side-only
  * operators (approximate / stateful / streaming) are additional
  * `queries` entries without an oracle (driver records a rows-only
  * check); each has a deterministic unit test instead.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 analog) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Tables.register(spark, "/root/testdata/sf0.001")
    spark.sql(QueryInventory.qa1.sparkSql)
  }

  private def sqlQuery(q: Q): (String, (SparkSession, String) => DataFrame) =
    q.name -> q.impl.getOrElse { (spark: SparkSession, dir: String) =>
      Tables.register(spark, dir)
      spark.sql(q.sparkSql)
    }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryInventory.all.map(sqlQuery).toMap ++ EngineOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops;
    * deterministic eng_* entries that ARE SQL-expressible carry an
    * oracle too (EngineOps.oracleSql) on top of their goldens. */
  def oracleSql: Map[String, String] =
    QueryInventory.all.flatMap(q => q.oracleSql.map(q.name -> _)).toMap ++
      EngineOps.oracleSql
}
