package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Z-value (Morton interleave) of the low 16 bits of two
    * non-negative ints: bit i of `a` lands at bit 2i, bit i of `b` at
    * bit 2i+1, so sorting by the z-value clusters rows that are close
    * in BOTH dimensions. Pure Column arithmetic (32 mask+shift+or
    * terms) — whole-stage-codegen'd, no UDF. */
  def zValue(a: Column, b: Column): Column = {
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(al.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(bl.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** Writes events Z-ordered on (user_id, hour-of-month):
    * range-partition + sort by the interleaved key, so each output
    * file covers a compact rectangle in (user, time) and carries
    * correspondingly TIGHT parquet min/max column stats — a selective
    * predicate on EITHER dimension then skips most files/row-groups
    * at scan time. This is the multi-dimensional clustering
    * complement to writeEventsByDay (one-dimension directory pruning)
    * and BucketedTables (join co-location): at 100 TB, Z-ordering the
    * two dominant filter columns turns full scans into reads of
    * O(selectivity) row groups without any secondary index. The sort
    * key is dropped before the write — skipping works off the raw
    * column stats, no schema change for readers.
    *
    * Both dimensions are NORMALIZED to 16-bit levels over their
    * observed [min, max] before interleaving — raw interleaving would
    * let the wider-range dimension own the high z bits and the sort
    * would degenerate to single-dimension clustering (hour spans more
    * bits than user_id here). The min/max pass is one 4-number
    * aggregate — an index-build step, same class as the ANN probe
    * fetches. */
  def writeEventsZOrdered(events: DataFrame, path: String, nFiles: Int = 32): Unit = {
    val relHour = ((dayofmonth(col("ts")) - 1) * 24 + hour(col("ts"))).cast("long")
    val dims = events
      .withColumn("zu", col("user_id").cast("long"))
      .withColumn("zh", relHour)
    val b = dims.agg(min("zu"), max("zu"), min("zh"), max("zh")).head()
    def lvl(c: Column, mn: Long, mx: Long): Column = {
      val span = math.max(mx - mn + 1, 1L)
      floor((c - lit(mn)).cast("double") * 65536.0 / span).cast("long")
    }
    // DETERMINISTIC range buckets, not repartitionByRange: the range
    // partitioner samples its bounds with a per-RDD seed, so file /
    // row-group boundaries (and every scan metric derived from them)
    // drift between sessions — the eng goldens caught exactly that.
    // The z-value is a bounded 32-bit interleave, so fixed-width
    // buckets over its observed span cluster identically and
    // reproducibly; hash-on-bucket sends each bucket to one partition.
    val zMax = (65536L * 65536L) - 1L
    dims
      .withColumn("zv", zValue(lvl(col("zu"), b.getLong(0), b.getLong(1)),
        lvl(col("zh"), b.getLong(2), b.getLong(3))))
      .withColumn("zb", floor(col("zv").cast("double") * nFiles / (zMax + 1.0)).cast("int"))
      .repartition(nFiles, col("zb"))
      .sortWithinPartitions("zb", "zv")
      .drop("zv", "zu", "zh", "zb")
      .write.option("compression", "zstd").mode("overwrite").parquet(path)
  }

  /** Small-file compaction — the "small files problem" repair op every
    * 100 TB ingest pipeline runs (streaming sinks and per-batch loads
    * leave thousands of KB-sized files; each costs a task, a footer
    * read, and a scheduler round-trip per scan). Bin-packs a
    * fragmented parquet directory into `ceil(bytes / targetFileBytes)`
    * files. The rewrite is a COALESCE — a partition MERGE with no
    * shuffle: each output task reads a handful of input files
    * sequentially and streams one output file, so cluster cost is one
    * linear pass and no data crosses the network beyond the reads. (A
    * `repartition` spelling would shuffle every byte — only warranted
    * when the rewrite must also re-cluster, which is
    * writeEventsZOrdered's job.) Returns (filesBefore, filesAfter).
    * The input listing is one driver-side metadata call — the same
    * class of bounded probe as the ANN index builds. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L << 20): (Int, Int) = {
    val in = new org.apache.hadoop.fs.Path(inPath)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: org.apache.hadoop.fs.Path) =
      fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
    val files = parquetFiles(in)
    val total = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(total.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inPath).coalesce(nOut)
      .write.option("compression", "zstd").mode("overwrite").parquet(outPath)
    (files.length, parquetFiles(new org.apache.hadoop.fs.Path(outPath)).length)
  }
}
