package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Incremental top-k for interactive analysis sessions (per the
  * retrieved "Incremental Based Framework for Efficient Top-K
  * Similarity Search in Interactive Data Analysis Sessions",
  * EDBT 2020 — PAPERS.md; pattern only): a user iterates on a ranked
  * query (larger k, tighter score threshold); the engine must answer
  * refinements from a cached candidate prefix instead of re-scanning
  * the corpus each time.
  *
  * Correctness rule (what makes the cache SOUND, not heuristic): the
  * session materializes the top `margin` rows by score once. A
  * refinement is answerable from that prefix iff it can only ever
  * need rows from the prefix:
  *   - k' ≤ margin (any k within the margin), and
  *   - the extra predicate, if any, is a tightened SCORE threshold
  *     (score-monotone) — it can only drop rows, never promote a row
  *     from beyond the prefix into the top k'.
  * Anything else (new non-score filter, k' > margin) falls back to a
  * full recompute — returning a weaker answer silently is the bug
  * class this rule exists to prevent (spec-asserted both ways).
  *
  * Scale shape: the one materialization is TakeOrderedAndProject
  * (never a global sort) persisted at `margin` rows (driver-bounded,
  * KB–MB); every cache-answerable refinement is then a local
  * filter+limit over an InMemoryTableScan — zero scans of the corpus
  * (plan-asserted). */
final class IncrementalTopK private (candidates: DataFrame, val margin: Int) {

  /** Top-k from the cached prefix; k must fit in the margin. The
    * trailing orderBy re-establishes a deterministic output order
    * over the k selected rows (limit's output order is no contract). */
  def topK(k: Int): DataFrame = {
    require(k <= margin, s"k=$k exceeds the materialized margin=$margin — recompute")
    candidates.limit(k)
      .orderBy(col("score").desc_nulls_last, col("id").asc)
  }

  /** Top-k with a tightened score threshold (rows scoring below
    * `minScore` drop out) — still answerable from the prefix. */
  def topK(k: Int, minScore: Double): DataFrame = {
    require(k <= margin, s"k=$k exceeds the materialized margin=$margin — recompute")
    candidates.filter(col("score") >= minScore).limit(k)
      .orderBy(col("score").desc_nulls_last, col("id").asc)
  }

  def unpersist(): Unit = candidates.unpersist()
}

object IncrementalTopK {

  /** Materialize a session over `base` ranked by `score` descending
    * (ties broken by `idCol` ascending — total order, so every
    * refinement is deterministic). */
  def session(base: DataFrame, idCol: String, score: Column,
              margin: Int): IncrementalTopK = {
    require(margin > 0, "margin must be positive")
    val cand = base
      .select(col(idCol).as("id"), score.as("score"))
      .orderBy(col("score").desc_nulls_last, col("id").asc)
      .limit(margin)
      // re-sort after limit: limit() output order is not a contract
      .orderBy(col("score").desc_nulls_last, col("id").asc)
      .persist(StorageLevel.MEMORY_AND_DISK)
    cand.count() // eager materialization — the one corpus scan
    new IncrementalTopK(cand, margin)
  }
}
