package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry: registers the driver-generated parquet tables
  * (`/root/repo/TESTDATA.md`) as temp views so every query in the
  * inventory can run through `spark.sql` verbatim.
  *
  * Scale note (100 TB): at cluster scale these would be external
  * catalog tables over partitioned directories; a temp view over
  * `spark.read.parquet` keeps the same logical plan (a
  * `LogicalRelation` with full filter/column pushdown into the
  * parquet scan), so nothing here blocks pushdown or pruning.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tracks the LAST dir registered per session (temp views are
    * session-global, so only one dir's views exist at a time —
    * memoizing on (session, dir) would let register(A); register(B);
    * register(A) silently leave the views pointing at B). */
  private val registered = scala.collection.mutable.Map[SparkSession, String]()

  def register(spark: SparkSession, dir: String): Unit = synchronized {
    if (!registered.get(spark).contains(dir)) {
      // events.ts is parquet TIMESTAMP(NANOS): Spark has no ns
      // timestamp type, so read it as a raw ns long and convert to a
      // µs timestamp (lossless here — the generated data is µs-aligned;
      // DuckDB's TIMESTAMP_NS read agrees after truncation).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      names.foreach { n =>
        val df = spark.read.parquet(s"$dir/$n.parquet")
        val fixed =
          if (n == "events")
            df.withColumn("ts",
              org.apache.spark.sql.functions.expr("timestamp_micros(CAST(ts AS BIGINT) DIV 1000)"))
          else df
        fixed.createOrReplaceTempView(n)
      }
      registered(spark) = dir
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    register(spark, dir)
    spark.table(name)
  }
}
