package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** MinHash + banded-LSH near-duplicate detection — the 100 TB scale
  * path for dedup (the oracle-checked small-N exact Jaccard lives in
  * QueryInventory.ql3).
  *
  * Pipeline (all join-based; NEVER a cross product):
  *   1. shingle each doc (distinct word k-grams)           — narrow
  *   2. H minhashes per doc via seeded xxhash64 min-fold   — narrow
  *   3. split signature into b bands of r rows; explode    — narrow
  *   4. group by (band index, band hash) → candidate pairs — ONE
  *      shuffle on the band key; bucket sizes are bounded by data
  *      similarity, and the `maxBucket` guard drops degenerate
  *      buckets (boilerplate collisions) the way production dedup
  *      pipelines do, keeping the pair-join skew-safe
  *   5. estimate Jaccard from full signatures of candidates — narrow
  *
  * Scale notes: per-doc state is O(H) ints; the only shuffles are the
  * band-key groupBy and the final pair dedup. At 100 TB with b≈20,
  * r≈6 the candidate set is ~linear in true-duplicate count, and AQE
  * handles residual bucket skew.
  *
  * Spirit of the reference's sparse dot products / attention
  * similarity (/root/reference/imc22_sdk/python/imc22.py:507-530),
  * re-expressed as the standard MinHash estimator (Broder '97).
  */
object MinHashDedup {

  /** `(doc, minhash_sig)` pairs via the codegen'd seeded-minima
    * kernel (graft.expressions.MinHashSigExpr) — a PROJECTION: one
    * compiled pass per doc, no explode amplification, no shuffle
    * (value-identical to the round-3 explode → `min(xxhash64(h, i))`
    * aggregate spelling, asserted in DedupSpec). The round-1
    * single-expression HOF fold (24 nested lambdas) and the round-3
    * relational aggregate are both superseded: the first drowned in
    * janino compilation, the second paid explode + shuffle. */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 shingleK: Int, numHashes: Int): DataFrame =
    docs
      // spread the CPU-heavy shingle/hash work across all cores: a
      // small input file arrives as one partition and would serialize
      // the whole pipeline (at cluster scale inputs are already
      // many-partitioned; this is a no-op cost there)
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("doc"),
        TextFunctions.minHashSig(col(textCol), shingleK, numHashes).as("minhash_sig"))

  /** Adds `minhash_sig: array<bigint>` of length `numHashes`. The
    * join key is a deterministic content hash (identical texts get
    * identical signatures, so text-keyed attachment is semantically
    * exact) — NOT monotonically_increasing_id, whose value can differ
    * between the two branches of the self-join under task retry or
    * AQE replanning. */
  def withSignature(docs: DataFrame, textCol: String, shingleK: Int = 3,
                    numHashes: Int = 24): DataFrame = {
    val idTmp = "_graft_text_key"
    val keyed = docs.withColumn(idTmp, md5(col(textCol)))
    keyed.join(
        signatures(keyed.select(col(idTmp), col(textCol)).distinct(),
          idTmp, textCol, shingleK, numHashes)
          .withColumnRenamed("doc", idTmp),
        Seq(idTmp))
      .drop(idTmp)
  }

  /** Bucket guard shared by both banded-dedup paths: keep only
    * (band, band_key) buckets with 2..maxBucket members.
    *
    * Spelled as an aggregate + inner join, NOT a window count: a
    * window over (band, band_key) full-sorts the banded table just to
    * count bucket sizes, while `groupBy.count` combines map-side and
    * the survivor set (only multi-member buckets — a tiny fraction of
    * all buckets) broadcasts or AQE-plans into the join. The ≥2 lower
    * bound also drops every singleton bucket BEFORE the self-join, so
    * the join input is proportional to the true-duplicate count, not
    * the corpus. `banded` must derive narrowly from a cached frame —
    * three consumers (count + two join sides) would otherwise
    * recompute the signature aggregation three times. */
  private def keepBuckets(banded: DataFrame, maxBucket: Int): DataFrame = {
    val good = banded.groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") >= 2 && col("bucket_n") <= maxBucket)
      .select(col("band"), col("band_key"))
    banded.join(good, Seq("band", "band_key"))
  }

  /** Candidate near-dup pairs (idA < idB) with estimated Jaccard ≥
    * `threshold`. `bands` × `rowsPerBand` must equal the signature
    * length used in withSignature. Defaults use r=4 rows per band:
    * the (1/b)^(1/r) S-curve then puts the candidate knee near
    * J≈0.5, so moderately-similar corpus boilerplate does NOT
    * explode the candidate set (r=2 admits near-everything). */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     shingleK: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                     threshold: Double = 0.5, maxBucket: Int = 64): DataFrame = {
    val numHashes = bands * rowsPerBand
    // cache the signature frame: consumed by the banding (3×: counts
    // + two join sides) and by the two signature-fetch joins below
    val signed = signatures(docs, idCol, textCol, shingleK, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // band keys: hash of each r-slice of the signature. Signatures
    // are NOT carried through the banding — a doc family of n near
    // dups colliding in all b bands yields b·n²/2 join rows, and
    // dragging two sig arrays (and the estimate computation) through
    // every one of them dominated runtime 16× at scale. Pairs are
    // deduplicated skinny (two longs), then each DISTINCT pair is
    // scored once via joins back to the cached signatures.
    val banded = bandKeys(signed, bands, rowsPerBand)

    // skinny (doc, band, band_key) rows, two self-join consumers:
    // cache so neither side re-runs the banding + bucket-count join
    val bucketed = keepBuckets(banded, maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val pairs = bucketed.select(col("band"), col("band_key"), col("doc").as("doc_a"))
      .join(bucketed.select(col("band"), col("band_key"), col("doc").as("doc_b")),
        Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()

    val est: Column =
      size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
        when(x === y, 1).otherwise(0)), v => v === 1)).cast("double") / numHashes

    val result = pairs
      .join(signed.select(col("doc").as("doc_a"), col("minhash_sig").as("sig_a")), Seq("doc_a"))
      .join(signed.select(col("doc").as("doc_b"), col("minhash_sig").as("sig_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), est.as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
    materializeAndRelease(result, signed, bucketed)
  }

  /** Band keys of a signed frame: (doc, band, band_key), one row per
    * band — the banding step shared by candidatePairs and the
    * incremental path. */
  private def bandKeys(signed: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    signed.select(
      col("doc"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws(",",
          slice(col("minhash_sig"), b * rowsPerBand + 1, rowsPerBand)), lit(b))
      }: _*)).as(Seq("band", "band_key")))

  /** INCREMENTAL near-dup candidate pairs — the daily-ingest path of
    * a production dedup pipeline: dedupe a DELTA batch against an
    * already-signed BASE corpus without re-pairing the base.
    * `baseSigned` is the persisted signature index ((doc,
    * minhash_sig) from `signatures`; at 100 TB it lives in storage
    * and this job reads it, never the base text). Work per ingest is
    * O(delta + colliding base rows): only delta docs are shingled and
    * hashed; candidate pairs are delta×base and delta×delta band
    * collisions — base×base pairs were resolved when the base was
    * built and are excluded BY CONSTRUCTION (the pair join's left
    * side is delta-only).
    *
    * Exactness: bucket sizes are counted over the UNION of base and
    * delta band keys, so bucket survivorship (2..maxBucket) is
    * identical to a full recompute — the result equals
    * candidatePairs(base ∪ delta) restricted to pairs with ≥1 delta
    * member, spec-asserted in DedupSpec. Buckets containing no delta
    * doc are additionally dropped (they cannot produce a delta pair —
    * that filter is the incremental saving). */
  def incrementalPairs(baseSigned: DataFrame, deltaDocs: DataFrame,
                       idCol: String, textCol: String, shingleK: Int = 3,
                       bands: Int = 16, rowsPerBand: Int = 4,
                       threshold: Double = 0.5, maxBucket: Int = 64): DataFrame = {
    val numHashes = bands * rowsPerBand
    val deltaSigned = signatures(deltaDocs, idCol, textCol, shingleK, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tagged = bandKeys(baseSigned, bands, rowsPerBand)
        .withColumn("is_delta", lit(false))
      .unionByName(bandKeys(deltaSigned, bands, rowsPerBand)
        .withColumn("is_delta", lit(true)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bucket guard over the UNION (full-recompute parity) + the
    // incremental filter: only buckets holding >= 1 delta doc matter
    val good = tagged.groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("bucket_n"), max(col("is_delta")).as("has_delta"))
      .filter(col("bucket_n") >= 2 && col("bucket_n") <= maxBucket &&
        col("has_delta"))
      .select(col("band"), col("band_key"))
    val bucketed = tagged.join(good, Seq("band", "band_key"))
    // left side delta-only: no base×base pair can form; canonical
    // (least, greatest) ordering + distinct collapses the twice-found
    // delta×delta pairs
    val pairs = bucketed.filter(col("is_delta"))
      .select(col("band"), col("band_key"), col("doc").as("doc_l"))
      .join(bucketed.select(col("band"), col("band_key"), col("doc").as("doc_r")),
        Seq("band", "band_key"))
      .filter(col("doc_l") =!= col("doc_r"))
      .select(least(col("doc_l"), col("doc_r")).as("doc_a"),
        greatest(col("doc_l"), col("doc_r")).as("doc_b"))
      .distinct()
    val allSigned = baseSigned.unionByName(deltaSigned)
    val est: Column =
      size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
        when(x === y, 1).otherwise(0)), v => v === 1)).cast("double") / numHashes
    val result = pairs
      .join(allSigned.select(col("doc").as("doc_a"), col("minhash_sig").as("sig_a")), Seq("doc_a"))
      .join(allSigned.select(col("doc").as("doc_b"), col("minhash_sig").as("sig_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), est.as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
    materializeAndRelease(result, deltaSigned, tagged)
  }

  /** `(doc, sig)` SimHash signatures via the codegen'd one-pass
    * kernel (graft.expressions.SimHashExpr) — a PROJECTION: per-bit
    * ±1 counters in one compiled loop, no explode, no shuffle. Bit b
    * is set iff the counter is strictly positive (ties → unset),
    * identical to TextFunctions.simHashFromHashes and to the round-3
    * packed-lane aggregate (both asserted equal in DedupSpec). */
  def simHashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("doc"), TextFunctions.simHash(col(textCol)).as("sig"))

  /** Exact-dup clusters by content hash (md5) — one shuffle. */
  def exactDupClusters(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_doc"))
      .filter(col("n_docs") > 1)

  /** SimHash banding dedup: 64-bit signature split into 8 8-bit
    * bands; docs sharing (band, value) are candidates — pigeonhole
    * guarantees a shared band for hamming distance ≤ 7 and catches
    * most pairs well beyond — ranked by hamming distance of full
    * signatures (≤ `maxHamming` kept). */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 12, maxBucket: Int = 256): DataFrame = {
    // same shape as candidatePairs: skinny pair dedup first, then one
    // hamming evaluation per distinct pair via the cached signatures
    val signed = simHashSignatures(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = signed.select(col("doc"),
      posexplode(array((0 until 8).map { b =>
        shiftright(col("sig"), b * 8).bitwiseAND(lit(0xffL))
      }: _*)).as(Seq("band", "band_key")))
    val bucketed = keepBuckets(banded, maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = bucketed.select(col("band"), col("band_key"), col("doc").as("doc_a"))
      .join(bucketed.select(col("band"), col("band_key"), col("doc").as("doc_b")),
        Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    val result = pairs
      .join(signed.select(col("doc").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(signed.select(col("doc").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
    materializeAndRelease(result, signed, bucketed)
  }

  /** Force the (small) pair result through the cached intermediates,
    * then unpersist them. Without this, every invocation leaves two
    * MEMORY_AND_DISK frames registered until the ContextCleaner
    * happens to GC them — a storage leak in long-lived sessions
    * (Bench alone invokes each dedup query twice per run). The
    * localCheckpoint stores only the result (candidate pairs — tiny
    * relative to the corpus) and is itself reclaimed when the
    * returned frame is garbage-collected. */
  private def materializeAndRelease(result: DataFrame,
                                    cached: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(eager = true)
    cached.foreach(_.unpersist(blocking = false))
    out
  }
}
