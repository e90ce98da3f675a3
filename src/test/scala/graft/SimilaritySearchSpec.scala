package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimilaritySearch

class SimilaritySearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 40 deterministic unit-ish vectors in 8 dims
  val rnd = new scala.util.Random(7)
  val vecs: Seq[(Long, Seq[Float])] =
    (0L until 40L).map(i => i -> Seq.fill(8)(rnd.nextGaussian().toFloat))
  val probe: Array[Float] = vecs.head._2.toArray

  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    dot / (na * nb)
  }

  test("brute-force top-k matches exhaustive ranking") {
    val corpus = vecs.tail.toDF("vec_id", "embedding")
    val got = SimilaritySearch.bruteForceTopK(corpus, "vec_id", "embedding", probe, 5)
      .collect().map(_.getAs[Long]("id")).toSeq
    val expected = vecs.tail
      .map { case (id, v) => (id, cosine(v, probe.toSeq)) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    assert(got == expected)
  }

  test("LSH top-k with full hamming budget equals brute force") {
    val corpus = vecs.tail.toDF("vec_id", "embedding")
    val brute = SimilaritySearch.bruteForceTopK(corpus, "vec_id", "embedding", probe, 5)
      .collect().map(_.getAs[Long]("id")).toSeq
    val lsh = SimilaritySearch.lshTopK(corpus, "vec_id", "embedding", probe,
      k = 5, nBits = 8, probeHamming = 8)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(lsh == brute)
  }

  test("LSH bucketing is deterministic and restricts candidates") {
    val corpus = vecs.toDF("vec_id", "embedding")
    val a = SimilaritySearch.lshTopK(corpus, "vec_id", "embedding", probe,
      k = 3, nBits = 8, probeHamming = 1).collect().map(_.getAs[Long]("id")).toSeq
    val b = SimilaritySearch.lshTopK(corpus, "vec_id", "embedding", probe,
      k = 3, nBits = 8, probeHamming = 1).collect().map(_.getAs[Long]("id")).toSeq
    assert(a == b)
    assert(a.headOption.contains(0L)) // probe itself hashes to its own bucket
  }

  test("IVF top-k with full probe budget equals brute force") {
    val corpus = vecs.tail.toDF("vec_id", "embedding")
    val brute = SimilaritySearch.bruteForceTopK(corpus, "vec_id", "embedding", probe, 5)
      .collect().map(_.getAs[Long]("id")).toSeq
    val ivf = SimilaritySearch.ivfTopK(corpus, "vec_id", "embedding", probe,
      k = 5, nCentroids = 8, nProbe = 8)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(ivf == brute)
    // pruned probe returns a subset ranking, deterministically
    val pruned = SimilaritySearch.ivfTopK(corpus, "vec_id", "embedding", probe,
      k = 5, nCentroids = 8, nProbe = 2)
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(pruned.nonEmpty && pruned.toSet.subsetOf(vecs.tail.map(_._1).toSet))
  }

  test("ivfTopK pre-indexed default path equals the inline-assignment foil") {
    import org.apache.spark.sql.functions._
    Tables.register(spark, "/root/testdata/sf0.001")
    val corpus = spark.table("embeddings").filter(col("vec_id") =!= 0)
    val p = spark.table("embeddings").filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val cb = SimilaritySearch.sampledCodebook(corpus, "vec_id", "embedding", 16)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_pre")
    SimilaritySearch.writeIvfPartitioned(
      corpus, "vec_id", "embedding", cb, s"$tmp/cells")
    val pre = spark.read.parquet(s"$tmp/cells")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e6))).toSeq
    // the persisted layout (cell as a partition column) and the
    // inline-assignment foil return IDENTICAL rankings under the
    // same codebook — the layout changes IO, never results
    val viaLayout = ids(SimilaritySearch.ivfTopK(pre, "vec_id", "embedding",
      p, k = 10, nProbe = 4, codebook = Some(cb)))
    val viaInline = ids(SimilaritySearch.ivfTopK(corpus, "vec_id", "embedding",
      p, k = 10, nProbe = 4, codebook = Some(cb)))
    assert(viaLayout == viaInline && viaLayout.nonEmpty)
    // the pre-indexed path must never silently re-assign under a
    // DIFFERENT (freshly sampled) codebook — it requires the one the
    // layout was built with
    intercept[IllegalArgumentException] {
      SimilaritySearch.ivfTopK(pre, "vec_id", "embedding", p, k = 10)
    }
    // and the plan over the layout prunes partitions: the cell filter
    // reaches the scan as a partition filter, so only nProbe of the
    // 16 cell directories are read
    val q = SimilaritySearch.ivfTopK(pre, "vec_id", "embedding",
      p, k = 10, nProbe = 4, codebook = Some(cb))
    q.collect()
    import org.apache.spark.sql.execution.FileSourceScanExec
    def flat(pl: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = pl match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => flat(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => flat(s.plan)
      case o => o +: o.children.flatMap(flat)
    }
    val partitionsRead = flat(q.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f.metrics.get("numPartitions").map(_.value).getOrElse(0L)
    }.sum
    assert(partitionsRead == 4, s"expected 4 pruned cell partitions, read $partitionsRead")
  }

  test("incremental IVF append: O(delta) indexing, exact top-k, fingerprint guard") {
    import org.apache.spark.sql.functions._
    Tables.register(spark, "/root/testdata/sf0.001")
    val emb = spark.table("embeddings").filter(col("vec_id") =!= 0)
    val base = emb.filter(col("vec_id") % 10 =!= 1)
    val delta = emb.filter(col("vec_id") % 10 === 1)
    val p = spark.table("embeddings").filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val cb = SimilaritySearch.sampledCodebook(base, "vec_id", "embedding", 16)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_app")
    SimilaritySearch.writeIvfPartitioned(
      base, "vec_id", "embedding", cb, s"$tmp/idx")
    SimilaritySearch.writeIvfPartitioned(
      emb, "vec_id", "embedding", cb, s"$tmp/fullidx")
    // the sidecar round-trips the exact codebook
    val (idxDf, cbBack) = SimilaritySearch.loadIvfIndex(spark, s"$tmp/idx")
    assert(cbBack.length == cb.length &&
      cbBack.zip(cb).forall { case (a, b) => a.sameElements(b) },
      "sidecar codebook drifted")
    assert(idxDf.count() == base.count())
    // append the delta: O(delta) work under the persisted codebook
    val (n, score, objective) = SimilaritySearch.appendToIvfPartitioned(
      spark, delta, "vec_id", "embedding", s"$tmp/idx")
    assert(n == delta.count() && n > 0)
    assert(score > 0 && objective > 0)
    // incremental layout == full re-index under the same codebook,
    // exactly (assignment is deterministic)
    def topk(path: String) = {
      val (df, c) = SimilaritySearch.loadIvfIndex(spark, path)
      SimilaritySearch.ivfTopK(df, "vec_id", "embedding", p,
          k = 10, nProbe = 4, codebook = Some(c))
        .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e6))).toSeq
    }
    assert(topk(s"$tmp/idx") == topk(s"$tmp/fullidx"),
      "incremental append diverged from a full re-index")
    // fingerprint guard: querying the layout under a DIFFERENT
    // codebook fails loudly instead of returning wrong neighbors
    val wrongCb = SimilaritySearch.lloydStep(emb, "vec_id", "embedding", cb)
    val (df2, _) = SimilaritySearch.loadIvfIndex(spark, s"$tmp/idx")
    val err = intercept[IllegalArgumentException] {
      SimilaritySearch.ivfTopK(df2, "vec_id", "embedding", p,
        k = 10, nProbe = 4, codebook = Some(wrongCb))
    }
    assert(err.getMessage.contains("wrong"), err.getMessage)
    // ...and a hand-built cell column with NO fingerprint metadata is
    // rejected too (presence of a cell column proves nothing)
    val unstamped = base.withColumn("cell", lit(0))
    val err2 = intercept[IllegalArgumentException] {
      SimilaritySearch.ivfTopK(unstamped, "vec_id", "embedding", p,
        k = 10, nProbe = 4, codebook = Some(cb))
    }
    assert(err2.getMessage.contains("metadata"), err2.getMessage)
    // appending to a non-layout fails loudly
    intercept[Exception] {
      SimilaritySearch.appendToIvfPartitioned(spark, delta,
        "vec_id", "embedding", s"$tmp/nowhere")
    }
    // ---- per-cell compaction: small files consolidate; top-k,
    // codebook sidecar, and fingerprint metadata all survive ----
    def dataFiles(path: String): Seq[java.nio.file.Path] = {
      import scala.jdk.CollectionConverters._
      val it = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try it.iterator().asScala.filter(f =>
          f.toString.endsWith(".parquet") &&
            !f.toString.contains("_codebook") &&
            java.nio.file.Files.isRegularFile(f)).toList
      finally it.close()
    }
    val preCompactTopk = topk(s"$tmp/idx")
    val before = dataFiles(s"$tmp/idx")
    val rewritten = SimilaritySearch.compactIvfPartitioned(
      spark, s"$tmp/idx", maxFilesPerCell = 1)
    val after = dataFiles(s"$tmp/idx")
    assert(rewritten > 0, "append left no multi-file cell to compact")
    assert(after.size < before.size,
      s"compaction did not shrink the layout: ${before.size} -> ${after.size}")
    // every cell is back to one file
    val perCell = after.groupBy(_.getParent.getFileName.toString)
    assert(perCell.values.forall(_.size == 1),
      s"over-budget cells survive: ${perCell.view.mapValues(_.size).toMap}")
    assert(topk(s"$tmp/idx") == preCompactTopk,
      "compaction changed top-k")
    // fingerprint metadata survived the rewrite: the loaded layout
    // still passes ivfTopK's codebook check (exercised by topk) AND
    // still REJECTS a wrong codebook
    val (df3, _) = SimilaritySearch.loadIvfIndex(spark, s"$tmp/idx")
    intercept[IllegalArgumentException] {
      SimilaritySearch.ivfTopK(df3, "vec_id", "embedding", p,
        k = 10, nProbe = 4, codebook = Some(wrongCb))
    }
    // compaction is idempotent: a second pass rewrites nothing
    assert(SimilaritySearch.compactIvfPartitioned(
      spark, s"$tmp/idx", maxFilesPerCell = 1) == 0)

    // the measured entries agree end-to-end
    val row = EngineOps.queries("eng_ivf_incremental")(
      spark, "/root/testdata/sf0.001").collect()(0)
    assert(row.getAs[Boolean]("topk_equal"), row.toString)
    assert(row.getAs[Long]("delta_files") > 0, row.toString)
    val ratio = row.getAs[Double]("score_ratio")
    assert(ratio > 0.0 && ratio < 2.0, row.toString)
    assert(row.getAs[Long]("n_delta") > 0)
    val crow = EngineOps.queries("eng_ivf_compaction")(
      spark, "/root/testdata/sf0.001").collect()(0)
    assert(crow.getAs[Boolean]("ok"), crow.toString)
    assert(crow.getAs[Boolean]("size_capped"), crow.toString)
    assert(crow.getAs[Long]("compact_files") < crow.getAs[Long]("delta_files"),
      crow.toString)
    assert(crow.getAs[Long]("cells_rewritten") > 0, crow.toString)
    // and it is idempotent across passes: a second run sees the same
    // pristine base index (the appended files were removed)
    val row2 = EngineOps.queries("eng_ivf_incremental")(
      spark, "/root/testdata/sf0.001").collect()(0)
    assert(row.toSeq == row2.toSeq, s"entry not idempotent: $row vs $row2")
  }

  test("oversized cell compacts to multiple size-capped files in one job") {
    import org.apache.spark.sql.functions._
    Tables.register(spark, "/root/testdata/sf0.001")
    val emb = spark.table("embeddings").filter(col("vec_id") =!= 0)
    val p = spark.table("embeddings").filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    // 2 cells so the layout is genuinely partitioned; tiny byte target
    // so one cell's bytes demand several bins
    val cb = SimilaritySearch.sampledCodebook(emb, "vec_id", "embedding", 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_cap")
    val base = emb.filter(col("vec_id") % 8 === 1)
    SimilaritySearch.writeIvfPartitioned(base, "vec_id", "embedding", cb, s"$tmp/idx")
    (2 to 8).foreach { m => // 7 small delta appends → ~8 files/cell
      SimilaritySearch.appendToIvfPartitioned(spark,
        emb.filter(col("vec_id") % 8 === (m % 8)), "vec_id", "embedding",
        s"$tmp/idx"): Unit
    }
    def topk() = {
      val (df, c) = SimilaritySearch.loadIvfIndex(spark, s"$tmp/idx")
      SimilaritySearch.ivfTopK(df, "vec_id", "embedding", p,
          k = 10, nProbe = 2, codebook = Some(c))
        .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e6))).toSeq
    }
    def files(): Seq[java.nio.file.Path] = {
      import scala.jdk.CollectionConverters._
      val it = java.nio.file.Files.walk(tmp.resolve("idx"))
      try it.iterator().asScala.filter(f =>
          f.toString.endsWith(".parquet") && !f.toString.contains("_codebook") &&
            java.nio.file.Files.isRegularFile(f)).toList
      finally it.close()
    }
    val before = topk()
    val preFiles = files()
    val cellBytes = preFiles.groupBy(_.getParent.getFileName.toString)
      .view.mapValues(_.map(java.nio.file.Files.size(_)).sum).toMap
    val target = cellBytes.values.max / 3 // force ≥3 bins somewhere
    val rewritten = SimilaritySearch.compactIvfPartitioned(
      spark, s"$tmp/idx", maxFilesPerCell = 1, targetFileBytes = target)
    assert(rewritten > 0)
    val after = files()
    assert(after.size < preFiles.size,
      s"no consolidation: ${preFiles.size} -> ${after.size}")
    val perCell = after.groupBy(_.getParent.getFileName.toString)
    // the oversized cell split into MULTIPLE files (never one blob)…
    assert(perCell.values.exists(_.size > 1),
      s"expected a >1-file cell under target=$target: " +
        perCell.view.mapValues(_.size).toMap)
    // …and every file respects the byte cap (1.5× slack for parquet
    // footer overhead / re-encoding drift on merged row groups)
    val oversize = after.filter(java.nio.file.Files.size(_) > target * 3 / 2)
    assert(oversize.isEmpty,
      s"size cap violated: ${oversize.map(f => f -> java.nio.file.Files.size(f))}")
    assert(topk() == before, "compaction changed top-k")
    // fingerprint metadata still guards the layout
    val (df, c) = SimilaritySearch.loadIvfIndex(spark, s"$tmp/idx")
    assert(df.schema("embedding").metadata
      .contains(SimilaritySearch.CodebookFpKey))
    assert(c.length == 2)
    // idempotent: the packed layout is within budget
    assert(SimilaritySearch.compactIvfPartitioned(
      spark, s"$tmp/idx", maxFilesPerCell = 1, targetFileBytes = target) == 0)
    // steady state: a further small append repacks only the NEW tail —
    // files that pack with nothing (previous passes' capped outputs)
    // are never re-read or rewritten, so nightly maintenance costs
    // O(bytes appended), not O(cell bytes)
    val capped = after.map(f => f.toString -> java.nio.file.Files.size(f)).toMap
    SimilaritySearch.appendToIvfPartitioned(spark,
      emb.filter(col("vec_id") % 16 === 2), "vec_id", "embedding",
      s"$tmp/idx"): Unit
    val preTopk2 = topk()
    SimilaritySearch.compactIvfPartitioned(spark, s"$tmp/idx",
      maxFilesPerCell = 1, targetFileBytes = target): Unit
    val after2 = files().map(f => f.toString -> java.nio.file.Files.size(f)).toMap
    val survivors = capped.keySet.intersect(after2.keySet)
    assert(survivors.nonEmpty,
      s"every previously-capped file was rewritten: ${capped.keySet}")
    assert(survivors.forall(k => capped(k) == after2(k)),
      "a surviving capped file changed size")
    assert(topk() == preTopk2, "steady-state compaction changed top-k")
    // packBins unit invariants: deterministic, byte-capped, lone bin
    // for an over-target file
    val bins = SimilaritySearch.packBins(
      Seq(("a", 10L), ("b", 60L), ("c", 50L), ("d", 200L)), 100L)
    assert(bins == SimilaritySearch.packBins(
      Seq(("d", 200L), ("c", 50L), ("a", 10L), ("b", 60L)), 100L))
    assert(bins.exists(_ == Seq("d")), s"over-target file must bin alone: $bins")
    assert(bins.flatten.sorted == Seq("a", "b", "c", "d"))
  }

  test("lloyd refinement never decreases the spherical k-means objective") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.vecDot
    Tables.register(spark, "/root/testdata/sf0.001")
    val emb = spark.table("embeddings")
    def obj(cb: Array[Array[Double]]): Double = {
      val scored = cb.map(c => vecDot(col("embedding"), array(c.map(lit): _*)))
      emb.select(greatest(scored: _*).as("s")).agg(avg(col("s"))).head().getDouble(0)
    }
    val cb0 = SimilaritySearch.sampledCodebook(emb, "vec_id", "embedding", 8)
    val cb1 = SimilaritySearch.lloydStep(emb, "vec_id", "embedding", cb0)
    val cb2 = SimilaritySearch.lloydStep(emb, "vec_id", "embedding", cb1)
    val (o0, o1, o2) = (obj(cb0), obj(cb1), obj(cb2))
    assert(o1 >= o0 - 1e-9 && o2 >= o1 - 1e-9, s"objective decreased: $o0 -> $o1 -> $o2")
    assert(o1 > o0, s"sampled codebook should be far from stationary: $o0 -> $o1")
    // a refined codebook with a full probe budget still finds the true top-k
    val p = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val refined = SimilaritySearch.ivfTopK(emb.filter(col("vec_id") =!= 0),
        "vec_id", "embedding", p, k = 5, nCentroids = 8, nProbe = 8,
        codebook = Some(cb1))
      .collect().map(_.getLong(0)).toSeq
    val brute = SimilaritySearch.bruteForceTopK(emb.filter(col("vec_id") =!= 0),
        "vec_id", "embedding", p, k = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(refined == brute)
  }

  test("LSH pair join finds identical vectors as top pair") {
    val withDup = vecs :+ (99L -> vecs.head._2)
    val corpus = withDup.toDF("vec_id", "embedding")
    val pairs = SimilaritySearch.lshPairJoin(corpus, "vec_id", "embedding",
      minCosine = 0.99, nBits = 6).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((0L, 99L)))
  }

  test("pair join auto-derives nBits and drops oversized buckets") {
    // auto nBits (nBits=0): same dup pair is still found
    val withDup = vecs :+ (99L -> vecs.head._2)
    val autoPairs = SimilaritySearch.lshPairJoin(withDup.toDF("vec_id", "embedding"),
      "vec_id", "embedding", minCosine = 0.99).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(autoPairs.contains((0L, 99L)))

    // a degenerate corpus where EVERY vector is identical lands in one
    // bucket; with maxBucket below the corpus size that bucket is
    // dropped — pair count is 0 instead of n² growth
    val clones = (0L until 30L).map(i => i -> vecs.head._2)
    val guarded = SimilaritySearch.lshPairJoin(clones.toDF("vec_id", "embedding"),
      "vec_id", "embedding", minCosine = 0.0, nBits = 6, maxBucket = 10)
    assert(guarded.count() == 0)
    // with the guard relaxed the same corpus yields all 30·29/2 pairs
    val open = SimilaritySearch.lshPairJoin(clones.toDF("vec_id", "embedding"),
      "vec_id", "embedding", minCosine = 0.0, nBits = 6, maxBucket = 1000)
    assert(open.count() == 30L * 29 / 2)
  }

  test("approximate recall@10 vs brute force on the real embeddings fixture") {
    // The quality metric the ANN paths trade selectivity for. The
    // sf0.01 embeddings are near-isotropic (weak neighbor structure —
    // the hard case for LSH), so thresholds sit below the measured
    // values (IVF 16/4 = 1.0, LSH 6-bit/ham-3 = 0.9) with margin;
    // both are deterministic on the fixed fixture.
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.table(spark, dir, "embeddings")
    val probe = emb.orderBy("vec_id").limit(1)
      .select("embedding").head().getSeq[Float](0).toArray
    val brute = SimilaritySearch.bruteForceTopK(emb, "vec_id", "embedding", probe, 10)
      .collect().map(_.getAs[Long]("id")).toSet
    val ivf = SimilaritySearch.ivfTopK(emb, "vec_id", "embedding", probe,
      k = 10, nCentroids = 16, nProbe = 4)
      .collect().map(_.getAs[Long]("id")).toSet
    val lsh = SimilaritySearch.lshTopK(emb, "vec_id", "embedding", probe,
      k = 10, nBits = 6, probeHamming = 3)
      .collect().map(_.getAs[Long]("id")).toSet
    assert((brute & ivf).size >= 8, s"IVF recall ${(brute & ivf).size}/10")
    assert((brute & lsh).size >= 7, s"LSH recall ${(brute & lsh).size}/10")
    // SQ8 with exact top-50 re-scoring only misses when a true top-10
    // vector falls outside the int8-code top-50 — near-impossible at
    // 8-bit resolution; measured 10/10, floored at 9 for margin
    val sq8 = SimilaritySearch.sq8TopK(emb, "vec_id", "embedding", probe,
      k = 10, rescore = 5)
      .collect().map(_.getAs[Long]("id")).toSet
    assert((brute & sq8).size >= 9, s"SQ8 recall ${(brute & sq8).size}/10")
  }

  test("SQ8 quantization: round-trip error bound, scale cancellation, edge cases") {
    import graft.expressions.Sq8Exprs.quantizeSymmetric
    val v = Array(-1.0, 0.0, 0.5, 1.0, 0.25)
    val (codes, scale) = quantizeSymmetric(v)
    assert(scale === 1.0 / 127.0)
    assert(codes(0) == -127 && codes(3) == 127 && codes(1) == 0)
    // dequantization error ≤ scale/2 per element (round-half-even)
    v.indices.foreach { i =>
      assert(math.abs(codes(i) * scale - v(i)) <= scale / 2 + 1e-12)
    }
    // zero vector → zero scale, zero codes
    val (zc, zs) = quantizeSymmetric(Array(0.0, 0.0))
    assert(zs == 0.0 && zc.forall(_ == 0))
    // code cosine approximates float cosine within int8 resolution
    val a = Array(0.3, -0.7, 0.2, 0.9)
    val b = Array(0.1, 0.4, -0.5, 0.8)
    val (ca, _) = quantizeSymmetric(a)
    val (cb, _) = quantizeSymmetric(b)
    def intCos(x: Array[Byte], y: Array[Byte]): Double = {
      val dot = x.zip(y).map { case (p, q) => p.toLong * q }.sum
      val nx = math.sqrt(x.map(p => p.toLong * p).sum.toDouble)
      val ny = math.sqrt(y.map(p => p.toLong * p).sum.toDouble)
      dot / (nx * ny)
    }
    def floatCos(x: Array[Double], y: Array[Double]): Double = {
      val dot = x.zip(y).map { case (p, q) => p * q }.sum
      dot / (math.sqrt(x.map(p => p * p).sum) * math.sqrt(y.map(p => p * p).sum))
    }
    assert(math.abs(intCos(ca, cb) - floatCos(a, b)) < 0.01)
  }

  test("Sq8 expressions: kernel parity with driver-side quantization, null on mismatch") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graftshim.ColumnBridge.{column, expr}
    import graft.expressions.{Sq8CosineExpr, Sq8EncodeExpr, Sq8Exprs}
    import spark.implicits._
    val rows = Seq(
      (1L, Array(0.5f, -0.25f, 1.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),
      (3L, Array(-2.0f, 4.0f, 8.0f)))
    val probe = Array(1.0f, 2.0f, 2.0f)
    val (pCodes, _) = Sq8Exprs.quantizeSymmetric(probe.map(_.toDouble))
    val df = rows.toDF("id", "v")
    val out = df.select(col("id"),
        column(Sq8EncodeExpr(expr(col("v")))).as("q"),
        column(Sq8CosineExpr(
          expr(column(Sq8EncodeExpr(expr(col("v")))).getField("codes")),
          pCodes)).as("acos"))
      .orderBy("id").collect()
    rows.zip(out).foreach { case ((_, v), r) =>
      val (expCodes, expScale) = Sq8Exprs.quantizeSymmetric(v.map(_.toDouble))
      val got = r.getStruct(1)
      assert(got.getAs[Array[Byte]]("codes").toSeq == expCodes.toSeq)
      assert(got.getAs[Double]("scale") === expScale)
    }
    // zero vector has no direction → null approx cosine
    assert(out(1).isNullAt(2))
    // dim mismatch yields null, never truncation
    val mism = Seq((1L, Array(0.5f, 0.5f))).toDF("id", "v")
      .select(column(Sq8CosineExpr(
        expr(column(Sq8EncodeExpr(expr(col("v")))).getField("codes")),
        pCodes)).as("acos")).head()
    assert(mism.isNullAt(0))
  }

  test("PqNearestExpr matches a plain-Scala argmin (differential)") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val m = 4; val k = 5; val subDim = 3
    val bookRnd = new scala.util.Random(11)
    val books = Array.fill(m, k, subDim)(bookRnd.nextGaussian())
    val flat = books.flatMap(_.flatten)
    val data = (0 until 60).map { i =>
      val r = new scala.util.Random(100 + i)
      (i % m, Seq.fill(subDim)(r.nextGaussian().toFloat))
    }
    val df = data.toDF("sub", "sv")
    val expr = org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.PqNearestExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expr(col("sub")),
        org.apache.spark.sql.graftshim.ColumnBridge.expr(col("sv")),
        m, k, subDim, flat))
    val got = df.select(col("sub"), col("sv"), expr.as("cell")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1), r.getInt(2)))
    got.foreach { case (sub, sv, cell) =>
      val dists = books(sub).map(c =>
        c.zip(sv).map { case (x, y) => (y - x) * (y - x) }.sum)
      val expected = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      assert(cell == expected, s"sub=$sub got $cell expected $expected")
    }
    // out-of-range subspace and wrong-length sub-vector yield NULL
    val bad = df.select(
      org.apache.spark.sql.graftshim.ColumnBridge.column(
        graft.expressions.PqNearestExpr(
          org.apache.spark.sql.graftshim.ColumnBridge.expr(lit(m)),
          org.apache.spark.sql.graftshim.ColumnBridge.expr(col("sv")),
          m, k, subDim, flat)).as("c")).collect()
    assert(bad.forall(_.isNullAt(0)))
  }

  test("IVF-PQ recovers clustered neighbors exactly; isotropic floors hold") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // (a) CLUSTERED corpus — the case IVF-PQ exists for: 8 tight
    // clusters in 32 dims; querying near cluster 0 with nProbe=2 must
    // return exactly cluster 0's members (re-rank makes it exact)
    val cRnd = new scala.util.Random(5)
    val centers = Array.fill(8, 32)(cRnd.nextGaussian())
    val clustered = (0L until 64L).map { i =>
      val c = centers((i % 8).toInt)
      i -> c.map(x => (x + cRnd.nextGaussian() * 0.01).toFloat).toSeq
    }
    val cdf = clustered.toDF("vec_id", "embedding")
    val cells = SimilaritySearch.lloydStep(cdf, "vec_id", "embedding",
      SimilaritySearch.sampledCodebook(cdf, "vec_id", "embedding", 8))
    val idx = graft.operators.ProductQuantizer.fitIvfPq(
      cdf, "vec_id", "embedding", cells, m = 8, k = 8)
    val probe0 = clustered.head._2.toArray
    val got = graft.operators.ProductQuantizer.ivfPqTopK(
      idx, cdf, "vec_id", "embedding", probe0, k = 8, nProbe = 2)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == (0L until 64L).filter(_ % 8 == 0).toSet)

    // (b) the isotropic embeddings fixture — the HARD case (residuals
    // exceed raw norms when cells carry no structure): floors sit
    // under the measured 0.6 (nProbe=4) / 0.7 (all cells) with margin
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.table(spark, dir, "embeddings").filter(col("vec_id") =!= 0)
    val probe = Tables.table(spark, dir, "embeddings")
      .filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val brute = SimilaritySearch.bruteForceTopK(emb, "vec_id", "embedding", probe, 10)
      .collect().map(_.getAs[Long]("id")).toSet
    val cells2 = SimilaritySearch.lloydStep(emb, "vec_id", "embedding",
      SimilaritySearch.sampledCodebook(emb, "vec_id", "embedding", 16))
    val idx2 = graft.operators.ProductQuantizer.fitIvfPq(
      emb, "vec_id", "embedding", cells2, m = 16, k = 32)
    val r4 = graft.operators.ProductQuantizer.ivfPqTopK(
      idx2, emb, "vec_id", "embedding", probe, k = 10, nProbe = 4)
      .collect().map(_.getAs[Long]("id")).toSet
    assert((brute & r4).size >= 4, s"IVF-PQ nProbe=4 recall ${(brute & r4).size}/10")
  }

  test("PQ codes compress to m small ints; ADC+re-rank recall floor holds") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.table(spark, dir, "embeddings").filter(col("vec_id") =!= 0)
    val probe = Tables.table(spark, dir, "embeddings")
      .filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val model = graft.operators.ProductQuantizer.fit(
      emb, "vec_id", "embedding", m = 16, k = 32)
    // model shape: 16 codebooks × 32 centroids × 4 dims
    assert(model.codebooks.length == 16)
    assert(model.codebooks.forall(b => b.length == 32 && b.forall(_.length == 4)))
    val enc = graft.operators.ProductQuantizer.encode(emb, "vec_id", "embedding", model)
    val codeRows = enc.collect()
    assert(codeRows.length == emb.count())
    // every code array is m ints in [0, k): the m-byte storage claim
    assert(codeRows.forall { r =>
      val cs = r.getSeq[Int](r.fieldIndex("codes"))
      cs.length == 16 && cs.forall(c => c >= 0 && c < 32)
    })
    val brute = SimilaritySearch.bruteForceTopK(emb, "vec_id", "embedding", probe, 10)
      .collect().map(_.getAs[Long]("id")).toSet
    // codes-only ADC ranks approximately (measured 0.5 on this
    // near-isotropic fixture — the hard case); the floor is loose
    val adcOnly = graft.operators.ProductQuantizer.adcTopK(enc, probe, model, 10)
      .collect().map(_.getAs[Long]("id")).toSet
    assert((brute & adcOnly).size >= 3, s"ADC recall ${(brute & adcOnly).size}/10")
    // the production shape — 50-candidate shortlist + exact re-rank —
    // recovers the exact top-10 here (measured 1.0; floor 8 with margin)
    val refined = graft.operators.ProductQuantizer.adcTopKRefined(
      enc, emb, "vec_id", "embedding", probe, model, k = 10, shortlist = 50)
      .collect().map(_.getAs[Long]("id")).toSet
    assert((brute & refined).size >= 8, s"refined recall ${(brute & refined).size}/10")
  }

  test("SemDeDup: copies co-locate with their source cell and drop; originals survive") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    Tables.register(spark, sf)
    val base = spark.table("embeddings").select(col("vec_id"), col("embedding"))
    val dups = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + lit(100000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
    val corpus = base.unionByName(dups)
    val init = SimilaritySearch.sampledCodebook(corpus, "vec_id", "embedding", 8)
    val (cb, _) = graft.operators.KMeans.fit(corpus, "embedding",
      maxIter = 3, tol = 1e-4, init)
    // cosine is scale-invariant: every planted copy lands in its
    // source's cell — verified directly on the assignment
    val cells = SimilaritySearch.assignCells(corpus, "vec_id", "embedding", cb)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L until 20L).foreach(i =>
      assert(cells(i) == cells(i + 100000L), s"copy of $i changed cell"))
    // the compiled kernel scores the identical doubles the literal
    // greatest-over-structs spelling does (differential, every row)
    val literal = {
      import graft.functions.VectorFunctions.vecCosine
      val scored = cb.zipWithIndex.map { case (c, i) =>
        struct(vecCosine(col("embedding"), array(c.map(lit): _*)).as("score"),
          lit(i).as("cell"))
      }
      corpus.select(col("vec_id"), greatest(scored: _*).getField("cell").as("cell"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    assert(literal == cells, "compiled cell assignment diverged from the literal spelling")
    // and the DOT metric (the IVF routing rule) matches its literal
    // spelling too — same Double.compare ordering, tie to higher cell
    val dotKernel = corpus.select(col("vec_id"),
      org.apache.spark.sql.graftshim.ColumnBridge.column(
        graft.expressions.CellAssignExpr(
          org.apache.spark.sql.graftshim.ColumnBridge.expr(col("embedding")),
          cb.flatten, cb.length, cb.head.length, "dot")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val dotLiteral = {
      import graft.functions.VectorFunctions.vecDot
      val scored = cb.zipWithIndex.map { case (c, i) =>
        struct(vecDot(col("embedding"), array(c.map(lit): _*)).as("score"),
          lit(i).as("cell"))
      }
      corpus.select(col("vec_id"), greatest(scored: _*).getField("cell").as("cell"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    assert(dotLiteral == dotKernel, "dot-metric kernel diverged from the literal spelling")
    // the within-cell pair join finds EXACTLY the 20 planted pairs
    // (the synthetic corpus holds no other >=0.95 cosine pair)
    val pairs = SimilaritySearch.semanticDedupPairs(
      corpus, "vec_id", "embedding", cb, minCosine = 0.95)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0L until 20L).map(i => (i, i + 100000L)).toSet, pairs)
    // keep-min-id survivors = the original corpus exactly
    val dropped = graft.operators.DedupClusters
      .connectedComponents(
        SimilaritySearch.semanticDedupPairs(
          corpus, "vec_id", "embedding", cb, 0.95)
          .select(col("id_a"), col("id_b")), "id_a", "id_b")
      .filter(col("node") =!= col("cluster"))
      .collect().map(_.getLong(0)).toSet
    assert(dropped == (0L until 20L).map(_ + 100000L).toSet, dropped)
    // the measured entry agrees end-to-end
    val rows = EngineOps.queries("eng_semantic_dedup")(spark, sf).collect()
    assert(rows.forall(_.getBoolean(3)), rows.mkString("; "))
    assert(rows.map(_.getLong(1)).sum == base.count() + 20, rows.mkString("; "))
    assert(rows.map(_.getLong(2)).sum == 20L, rows.mkString("; "))
  }

  test("cell-assign kernel at k=4096: still compiled (no janino breach), scores exact") {
    // the k ≈ 4096 path SemDeDup's k = n/64 rule reaches on a
    // ~260k-vector corpus: the literal greatest-over-structs spelling
    // breaches janino's 64 KB method limit around k ≈ 100, so THIS is
    // the scale regime the kernel exists for. CODEGEN_ONLY turns the
    // silent interpreted fallback into a hard failure (and wholeStage
    // off forces the expression through the projection factory the
    // flag governs), so a breach fails the test instead of hiding as
    // a slow plan.
    import org.apache.spark.sql.functions._
    val k = 4096
    val dim = 8
    val flat = Array.tabulate(k * dim)(i => math.sin(i * 0.7312))
    val df = spark.range(500).select(col("id"),
      array((1 to dim).map(j =>
        sin(col("id") * lit(0.13 * j)).cast("float")): _*).as("v"))
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevWs = spark.conf.getOption("spark.sql.codegen.wholeStage")
    val got =
      try {
        spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        df.select(col("id"),
            org.apache.spark.sql.graftshim.ColumnBridge.column(
              graft.expressions.CellAssignExpr(
                org.apache.spark.sql.graftshim.ColumnBridge.expr(col("v")),
                flat, k, dim, "cosine")).as("cell"))
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      } finally {
        prevMode.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
          spark.conf.set("spark.sql.codegen.factoryMode", _))
        prevWs.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
          spark.conf.set("spark.sql.codegen.wholeStage", _))
      }
    // independent plain-Scala re-derivation of the argmax (same
    // Double.compare ordering: tie → higher cell, NaN outranks)
    val normC = Array.tabulate(k) { c =>
      var d = 0.0
      (0 until dim).foreach(j => d += flat(c * dim + j) * flat(c * dim + j))
      math.sqrt(d)
    }
    df.collect().foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).toArray
      var nv = 0.0
      v.foreach(x => nv += x.toDouble * x.toDouble)
      val nvS = math.sqrt(nv)
      var best = 0
      var bestS = Double.NegativeInfinity
      var c = 0
      while (c < k) {
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += v(i).toDouble * flat(c * dim + i); i += 1 }
        val s = dot / (nvS * normC(c))
        if (java.lang.Double.compare(s, bestS) >= 0) { bestS = s; best = c }
        c += 1
      }
      assert(got(id) == best, s"kernel diverged at id=$id: ${got(id)} != $best")
    }
  }
}
