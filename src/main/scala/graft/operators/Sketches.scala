package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Probabilistic sketch operators — the approximate-stats family the
  * reference's profiler answers exactly at chip scale
  * (/root/reference/simulator/profiler.py:91-139 per-layer counters;
  * /root/reference/tools/ai_feedback.py:127-151 batch statistics) and
  * a 100 TB engine answers with sketches: HLL (`eng_approx_distinct`),
  * count-min frequency, and Bloom membership.
  *
  * Shapes: the sketch build is ONE aggregation (Spark's
  * `count_min_sketch` / `stat.bloomFilter` are distributed aggregates
  * with map-side partial merge); the built sketch is a few KB fetched
  * to the driver — an index-build artifact like the IVF codebook —
  * and probing is driver-side O(1) per key. */
object Sketches {

  /** Count-min frequency estimates + Bloom membership vs exact counts
    * for the probe keys. Deterministic: both sketches are seeded. */
  def frequencySketch(events: DataFrame, keyCol: String,
                      probes: Seq[Long], eps: Double = 0.001,
                      confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._

    val bytes = events
      .select(expr(s"count_min_sketch($keyCol, ${eps}d, ${confidence}d, $seed)"))
      .head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

    val bloom = events.stat.bloomFilter(keyCol, expectedNumItems = 100000, fpp = 0.01)

    val probed = probes.map { k =>
      (k, cms.estimateCount(k), bloom.mightContain(k))
    }.toDF(keyCol, "cms_estimate", "bloom_contains")

    val exact = events.groupBy(col(keyCol))
      .agg(count(lit(1)).as("exact_count"))

    probed.join(exact, Seq(keyCol), "left")
      .select(col(keyCol), coalesce(col("exact_count"), lit(0L)).as("exact_count"),
        col("cms_estimate"), col("bloom_contains"))
      .orderBy(col(keyCol))
  }
}
