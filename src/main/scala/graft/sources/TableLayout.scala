package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned, compressed table layout — the at-rest side of the
  * 100 TB design (the storage analog of the reference's flash image
  * layout + codec choice, /root/reference/tools/hive_compile.py:143-194
  * and /root/reference/firmware/middleware/compression.c).
  *
  * Event-time data is written partitioned by day with zstd parquet:
  * date predicates then prune entire directories before any IO
  * (`PartitionFilters` in the scan, asserted by test), and the
  * columnar codecs subsume the reference's RLE/LZ4/delta stack. */
object TableLayout {

  /** Writes events partitioned by event day (zstd parquet). */
  def writeEventsByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write
      .partitionBy("event_date")
      .option("compression", "zstd")
      .mode("overwrite")
      .parquet(path)

  /** Reads back with a day filter — resolves via partition pruning,
    * not data IO. */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("event_date") === lit(day))
}
