package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MinHashDedup

/** Dedup fixtures per FIXTURES.md §B.9: byte-identical texts cluster
  * exactly; one-token-of-20 difference is a near-dup (Jaccard > 0.5);
  * unrelated docs are not candidates. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val base = (1 to 20).map(i => s"tok$i").mkString(" ")
  val near = ((1 to 10).map(i => s"tok$i") ++ Seq("CHANGED") ++
    (12 to 20).map(i => s"tok$i")).mkString(" ")
  val far = (1 to 20).map(i => s"other$i").mkString(" ")

  test("embedding-cosine dedup recovers exactly the 20 planted near-copies") {
    val rows = EngineOps.queries("eng_embed_dedup")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 20)
    // every cluster pairs a source vector (id < 20) with its planted
    // copy (id + 100000): canonical min-id label, two members
    rows.foreach { r =>
      assert(r.getAs[Long]("cluster") < 20L)
      assert(r.getAs[Long]("n_members") == 2L)
      assert(r.getAs[Long]("id_sum") == 2 * r.getAs[Long]("cluster") + 100000L)
    }
  }

  test("exact-dup clusters by md5") {
    val docs = Seq((1L, base), (2L, base), (3L, far)).toDF("doc_id", "text")
    val clusters = MinHashDedup.exactDupClusters(docs, "doc_id", "text").collect()
    assert(clusters.length == 1)
    assert(clusters.head.getAs[Long]("n_docs") == 2)
    assert(clusters.head.getAs[Long]("keep_doc") == 1L)
  }

  test("minhash LSH finds the near-dup pair and not the unrelated one") {
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = MinHashDedup.candidatePairs(docs, "doc_id", "text",
      shingleK = 2, bands = 12, rowsPerBand = 2, threshold = 0.3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
    assert(!pairs.contains((2L, 3L)))
  }

  test("minhash estimate is high for identical docs") {
    val docs = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val est = MinHashDedup.candidatePairs(docs, "doc_id", "text",
      shingleK = 2, bands = 12, rowsPerBand = 2, threshold = 0.5)
      .collect().head.getAs[Double]("est_jaccard")
    assert(est == 1.0)
  }

  test("simhash kernel equals the HOF fold and the legacy aggregate spelling") {
    import graft.functions.TextFunctions
    Tables.register(spark, "/root/testdata/sf0.001")
    val docs = spark.table("documents").limit(50)
    val kernel = MinHashDedup.simHashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference spelling 1: the interpreted HOF fold over HOF tokens
    val hof = docs.select(col("doc_id"),
        TextFunctions.simHashFromHashes(TextFunctions.tokenHashesHof(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference spelling 2: the round-3 packed-lane relational aggregate
    val laneAggs = (0 until 16).map { g =>
      val packed = (0 until 4).map { j =>
        shiftright(col("h"), g * 4 + j).bitwiseAND(lit(1L)) * lit(1L << (j * 16))
      }.reduce(_ + _)
      sum(packed).as(s"p$g")
    }
    val counts = docs
      .select(col("doc_id").as("doc"),
        explode(TextFunctions.tokenHashesHof(col("text"))).as("h"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n"), laneAggs: _*)
    val sigCol = (0 until 64).map { b =>
      val (g, j) = (b / 4, b % 4)
      val ones = shiftright(col(s"p$g"), j * 16).bitwiseAND(lit(0xffffL))
      when(ones * 2 > col("n"), lit(1L << b)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    val rel = counts.select(col("doc"), sigCol.as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel == hof)
    assert(kernel == rel)
    assert(kernel.size == 50)
  }

  test("minhash kernel equals the legacy min(xxhash64) aggregate spelling") {
    import graft.functions.TextFunctions
    Tables.register(spark, "/root/testdata/sf0.001")
    val docs = spark.table("documents").limit(50)
    val numHashes = 24
    val kernel = MinHashDedup.signatures(docs, "doc_id", "text", shingleK = 3, numHashes)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = docs
      .select(col("doc_id").as("doc"),
        explode(transform(TextFunctions.shingles(col("text"), 3), s => xxhash64(s))).as("h"))
      .groupBy(col("doc"))
      .agg(array((0 until numHashes).map(i => min(xxhash64(col("h"), lit(i)))): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(kernel == agg)
    assert(kernel.size == 50)
  }

  test("token-hash and fingerprint kernels equal their HOF spellings (incl. whitespace edges)") {
    import graft.functions.TextFunctions
    Tables.register(spark, "/root/testdata/sf0.001")
    val real = spark.table("documents").limit(50).select(col("text"))
    // whitespace edge cases: leading/trailing/runs produce empty
    // tokens in the split — the kernels must hash them identically
    val edges = Seq("  leading", "trailing  ", "a  b\t c", "", " ").toDF("text")
    Seq(real, edges).foreach { df =>
      val rows = df.select(
        TextFunctions.tokenHashes(col("text")).as("k"),
        TextFunctions.tokenHashesHof(col("text")).as("h"),
        TextFunctions.docFingerprint(col("text")).as("fk"),
        TextFunctions.docFingerprintHof(col("text")).as("fh")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1))
        assert(r.getLong(2) == r.getLong(3))
      }
    }
  }

  test("incremental pairs equal the full recompute restricted to delta pairs") {
    // corpus with planted near-dup families spanning the base/delta
    // split: docs 1/2 near-dups (both base), 3/4 near-dups (base,
    // delta), 5/6 exact dups (both delta), plus unrelated filler
    val texts = Seq(
      1L -> base, 2L -> near,                       // base-base pair
      3L -> (base + " extra"), 4L -> (near + " extra"), // base-delta-ish
      5L -> far, 6L -> far,                         // delta-delta exact
      7L -> (1 to 20).map(i => s"zz$i").mkString(" "),
      8L -> (1 to 20).map(i => s"yy$i").mkString(" "))
    val docs = texts.toDF("doc_id", "text")
    val isDelta = col("doc_id") >= 4
    val baseSigned = MinHashDedup.signatures(
      docs.filter(!isDelta), "doc_id", "text", shingleK = 3, numHashes = 64)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val incr = MinHashDedup.incrementalPairs(baseSigned, docs.filter(isDelta),
        "doc_id", "text", threshold = 0.2)
      .collect().map(key).toSet
    val full = MinHashDedup.candidatePairs(docs, "doc_id", "text",
        threshold = 0.2)
      .collect().map(key).toSet
    val fullDeltaOnly = full.filter(p => p._1 >= 4 || p._2 >= 4)
    assert(incr == fullDeltaOnly,
      s"incremental $incr != restricted full $fullDeltaOnly")
    // base-base pairs are excluded by construction, and the planted
    // delta-involving dup (5,6) is found
    assert(incr.exists(p => p._1 == 5L && p._2 == 6L))
    assert(!incr.exists(p => p._1 < 4L && p._2 < 4L))
    assert(full.exists(p => p._1 == 1L && p._2 == 2L)) // full sees base-base
  }

  test("simhash pairs: near-dup within hamming budget, unrelated outside") {
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = MinHashDedup.simHashPairs(docs, "doc_id", "text", maxHamming = 16)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }
}
