package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Spherical k-means (Lloyd) trained to convergence — the
  * codebook-training operator behind IVF cell assignment
  * (SimilaritySearch.ivfTopK) and embedding-space clustering of a
  * training corpus. (Ref analog: the per-layer calibration sweep that
  * fits quantization codebooks over activation samples,
  * /root/reference/tools/quantize_model.py:60-118 — iterative
  * refinement of a small codebook against a large sample set.)
  *
  * Scale shape: each iteration is ONE distributed aggregate. The
  * per-row assignment (argmax cosine over k literal centroids) is a
  * broadcast-free codegen'd expression; the groupBy computes, per
  * cell, the member count, the summed best-cosine, and the vector sum
  * of the L2-NORMALIZED members (VecAggregates.vecSumAgg — map-side
  * partial merge, O(dim) state per cell). Only k × dim doubles return
  * to the driver per iteration; the corpus is never collected, so the
  * loop costs O(iters · n·k·dim) distributed work regardless of
  * cluster size.
  *
  * Determinism: new centroids are rounded to 9 dp (vecSumAgg adds
  * doubles in partition order — raw sums wiggle ~1e-12 across shuffle
  * widths; rounding pins the codebook to one cross-run value, the
  * same discipline as SimilaritySearch.lloydStep). The reported
  * objective/movement are rounded to 6 dp.
  *
  * Objective: mean best-cell cosine over the corpus. Normalizing
  * members before summing makes the update step the exact maximizer
  * of the summed cosine (textbook spherical k-means), so the
  * objective is non-decreasing iteration over iteration —
  * spec-asserted in KMeansSpec.
  */
object KMeans {

  /** One iteration's report: 1-based index, mean best-cosine BEFORE
    * the update, max centroid L2 movement of the update, and how many
    * cells had members. */
  final case class IterStat(iter: Int, objective: Double,
                            maxMove: Double, usedCells: Int)

  /** Best cell for a vector — the compiled cosine-argmax kernel
    * (graft.expressions.CellAssignExpr, codebook as a plan reference
    * object): the literal greatest-of-structs spelling breaches
    * janino's 64 KB method limit around k ≈ 100 and silently drops
    * the whole projection to interpreted eval — fatal for the
    * SemDeDup-sized codebooks (k scales with the corpus) this fit
    * now serves. Identical doubles and tie-break (Double.compare),
    * so the fit history — oracle-checked as eng_kmeans_fit — is
    * unchanged. */
  private def bestCellScored(centroids: Array[Array[Double]])(v: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.CellAssignExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expr(v),
        centroids.flatten, centroids.length, centroids.head.length, "cosine",
        withScore = true))

  /** Lloyd iterations from `init` until max centroid movement <= tol
    * or `maxIter`; returns the final codebook (unit-norm rows, 9 dp)
    * and the per-iteration history. Empty cells keep their previous
    * centroid. */
  def fit(corpus: DataFrame, vecCol: String, maxIter: Int, tol: Double,
          init: Array[Array[Double]]): (Array[Array[Double]], Seq[IterStat]) = {
    var centroids = init
    val history = Seq.newBuilder[IterStat]
    var iter = 0
    var moved = Double.MaxValue
    // every Lloyd iteration re-reads the corpus; cache ONLY the vector
    // column for the loop's lifetime so iterations 2..n skip the
    // source scan (at scale: persist the projection, not the table)
    val vecs = corpus.select(col(vecCol)).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try while (iter < maxIter && moved > tol) {
      // ONE kernel pass per row returns (cell, winning cosine): the
      // score is the same double the argmax compared (same folds as
      // vecCosine against that centroid), so the objective is
      // unchanged — and the k·dim codebook Literal the old re-score
      // spelling rebuilt and reshipped every sweep is gone
      val assigned = bestCellScored(centroids)(col(vecCol))
      // vecSumAgg's input contract is array<float> (the embedding
      // storage type); normalizing costs one float rounding per
      // element (~1e-7 relative), far inside the 6-dp report grid
      val unit = vecScale(col(vecCol), lit(1.0) / vecL2(col(vecCol)))
        .cast("array<float>")
      val cells = vecs
        .select(assigned.as("a"), unit.as("u"))
        .select(col("a.cell").as("cell"), col("a.score").as("cos"),
          col("u"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), sum(col("cos")).as("sum_cos"),
          graft.functions.VecAggregates.vecSumAgg(col("u")).as("s"))
        .collect()
        .map(r => r.getAs[Int]("cell") ->
          (r.getAs[Long]("n"), r.getAs[Double]("sum_cos"),
            r.getSeq[Double](r.fieldIndex("s")).toArray))
        .toMap
      val total = cells.valuesIterator.map(_._1).sum
      val objective = cells.valuesIterator.map(_._2).sum / total
      val next = centroids.zipWithIndex.map { case (old, i) =>
        cells.get(i) match {
          case Some((_, _, s)) =>
            val norm = math.sqrt(s.map(x => x * x).sum)
            if (norm == 0.0) old
            else s.map(x => math.rint(x / norm * 1e9) / 1e9)
          case None => old
        }
      }
      moved = centroids.zip(next).map { case (a, b2) =>
        math.sqrt(a.zip(b2).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.max
      history += IterStat(iter + 1, math.rint(objective * 1e6) / 1e6,
        math.rint(moved * 1e6) / 1e6, cells.size)
      centroids = next
      iter += 1
    } finally vecs.unpersist(blocking = false)
    (centroids, history.result())
  }
}
