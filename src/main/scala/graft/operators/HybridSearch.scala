package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical+dense retrieval via reciprocal-rank fusion (RRF,
  * Cormack/Clarke/Buettcher SIGIR '09) — the composition every
  * production retrieval stack runs: a sparse BM25 pass and a dense
  * embedding-cosine pass each produce a bounded candidate list, and
  * the fusion score Σ 1/(k0 + rank) rewards documents found by BOTH
  * modalities without requiring their scores to be commensurable
  * (BM25 is unbounded, cosine is [-1, 1] — rank fusion sidesteps the
  * calibration problem entirely).
  *
  * Scale shape: the retrievers are the scale path (BM25 is a
  * compiled shuffle-free projection into TakeOrderedAndProject;
  * dense is brute/LSH/IVF per SimilaritySearch) and each emits ≤
  * `candidates` rows, so the fusion itself — rank windows over the
  * candidate lists, a union, one groupBy id — touches O(candidates)
  * rows regardless of corpus size. Nothing here grows with the
  * corpus. */
object HybridSearch {

  /** RRF-fuse ranked runs. Each input frame must carry (id, score)
    * with HIGHER score = better; ranks are derived 1-based per run
    * (ties broken by id for determinism). Returns the fused top-k:
    * (id, rrf_score, n_runs) — n_runs = how many retrievers surfaced
    * the doc. */
  def fuse(runs: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(runs.nonEmpty, "fuse needs at least one ranked run")
    val ranked = runs.map { r =>
      val Seq(idCol, scoreCol) = r.columns.take(2).toSeq
      r.select(col(idCol).as("id"), col(scoreCol).as("s"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("s").desc_nulls_last, col("id").asc)))
        .select(col("id"), col("rank"))
    }
    // the unpartitioned rank window is over a ≤candidates-row frame
    // (each run is already a top-N) — the aggregate-before-window
    // discipline, not a corpus-wide sort
    ranked.reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(round(sum(lit(1.0) / (lit(k0) + col("rank"))), 6).as("rrf_score"),
        count(lit(1)).as("n_runs"))
      .orderBy(col("rrf_score").desc_nulls_last, col("id").asc)
      .limit(k)
  }

  /** BM25 candidates + dense cosine candidates → RRF top-k.
    * `docs` and `corpus` align on id (doc_id == vec_id here). */
  def hybridTopK(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], stats: Bm25.Stats,
                 corpus: DataFrame, vecIdCol: String, vecCol: String,
                 probe: Array[Float], k: Int, candidates: Int = 50,
                 k0: Int = 60): DataFrame = {
    val lexical = Bm25.topK(docs, idCol, textCol, terms, stats, candidates)
    val dense = SimilaritySearch.bruteForceTopK(corpus, vecIdCol, vecCol,
      probe, candidates)
    fuse(Seq(lexical, dense), k, k0)
  }
}
