package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a larger scale factor from an existing driver-generated SF
  * by key-shifted replication — the scale-evidence dataset for
  * ScaleBench (sf0.1 × 10 ≈ sf1). The driver testdata is read-only
  * and its generator isn't available, so scaling is derivation, not
  * regeneration.
  *
  * Replication must not manufacture pathologies the real generator
  * wouldn't produce, so each replica:
  *  - shifts every primary/foreign key CONSISTENTLY by
  *    r·(max(key)+1), preserving join fan-outs, key skew, and
  *    per-key time-series shapes exactly (each replica is a disjoint
  *    copy of the original's distribution);
  *  - PERTURBS document text (every 5th word replaced by a salted
  *    token) so replicas are not near-duplicates of each other —
  *    otherwise MinHash/SimHash dedup at sf1 would measure a planted
  *    45×-pair explosion instead of 10× more data;
  *  - circularly rotates embedding vectors by r positions
  *    (norm-preserving, distribution-preserving) so ANN/embedding
  *    dedup sees 10× more distinct vectors, not 10 copies of each.
  * nation/region are semantic dimensions and copy unchanged.
  *
  * Everything is one `explode(sequence(...))` pass per table — no
  * driver-side loops, no unions; the same spelling works at any
  * factor. */
object ScaleData {

  private def withReplica(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("_r", explode(sequence(lit(0L), lit(factor.toLong - 1L))))

  private def maxOf(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).head().getLong(0)

  /** Shift `cols` by _r·stride(col) where stride = max+1 (per the
    * SOURCE table owning each key); drop the replica column last. */
  private def shifted(df: DataFrame, strides: Map[String, Long]): DataFrame = {
    val out = strides.foldLeft(df) { case (acc, (c, stride)) =>
      acc.withColumn(c, col(c) + col("_r") * lit(stride))
    }
    out.drop("_r")
  }

  def scale(spark: SparkSession, srcDir: String, dstDir: String, factor: Int): Unit = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    def read(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$dstDir/$t.parquet")

    // key strides, each owned by the table that defines the key
    val cStride = maxOf(read("customer"), "c_custkey") + 1
    val sStride = maxOf(read("supplier"), "s_suppkey") + 1
    val pStride = maxOf(read("part"), "p_partkey") + 1
    val oStride = maxOf(read("orders"), "o_orderkey") + 1
    val eStride = maxOf(read("events"), "event_id") + 1
    val uStride = maxOf(read("events"), "user_id") + 1
    val dStride = maxOf(read("documents"), "doc_id") + 1
    val vStride = maxOf(read("embeddings"), "vec_id") + 1

    read("region").write.mode("overwrite").parquet(s"$dstDir/region.parquet")
    read("nation").write.mode("overwrite").parquet(s"$dstDir/nation.parquet")

    write(shifted(withReplica(read("customer"), factor),
      Map("c_custkey" -> cStride)), "customer", 2)
    write(shifted(withReplica(read("supplier"), factor),
      Map("s_suppkey" -> sStride)), "supplier", 1)
    write(shifted(withReplica(read("part"), factor),
      Map("p_partkey" -> pStride)), "part", 2)
    write(shifted(withReplica(read("orders"), factor),
      Map("o_orderkey" -> oStride, "o_custkey" -> cStride)), "orders", 4)
    write(shifted(withReplica(read("lineitem"), factor),
      Map("l_orderkey" -> oStride, "l_partkey" -> pStride,
        "l_suppkey" -> sStride)), "lineitem", 8)
    write(shifted(withReplica(read("events"), factor),
      Map("event_id" -> eStride, "user_id" -> uStride)), "events", 4)

    // documents: shift doc_id; perturb text on replicas (every 5th
    // word -> salted token) so replicas aren't near-dups; n_chars
    // follows the perturbed text
    val docs = shifted(withReplica(read("documents"), factor)
        .withColumn("_rr", col("_r")), // keep replica id past the drop
      Map("doc_id" -> dStride))
    val perturbed = docs
      .withColumn("text",
        when(col("_rr") === 0, col("text"))
          .otherwise(array_join(
            // 1-arg transform((w)) would keep shingles intact; the
            // (w, i) form lets us knock out every 5th word
            transform(split(col("text"), " "), (w, i) =>
              when(i % 5 === 4,
                concat(lit("x"),
                  substring(md5(concat(w, col("_rr").cast("string"))), 1, 6)))
                .otherwise(w)),
            " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("_rr")
    write(perturbed, "documents", 2)

    // embeddings: shift vec_id; circular-rotate vectors by replica
    // index (norm- and distribution-preserving, decorrelates replicas)
    val emb = shifted(withReplica(read("embeddings"), factor)
        .withColumn("_rr", col("_r")),
      Map("vec_id" -> vStride))
    val rotated = emb
      .withColumn("_dim", size(col("embedding")))
      .withColumn("_k", (col("_rr") % col("_dim")).cast("int"))
      .withColumn("embedding",
        when(col("_k") === 0, col("embedding"))
          .otherwise(concat(
            slice(col("embedding"), col("_k") + 1, col("_dim") - col("_k")),
            slice(col("embedding"), lit(1), col("_k")))))
      .drop("_rr", "_dim", "_k")
    write(rotated, "embeddings", 2)
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, dstDir) = args.take(2)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    scale(spark, srcDir, dstDir, factor)
    spark.stop()
  }
}
