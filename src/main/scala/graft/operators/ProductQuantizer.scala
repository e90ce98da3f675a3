package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for ANN search (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011) — the
  * MEMORY-side scale path beside the engine's scan-side paths (LSH
  * buckets, IVF cells): each vector splits into `m` subspaces, each
  * subspace quantized by its own `k`-centroid codebook, so a
  * dim-float vector stores as `m` small codes (dim·4 bytes → m bytes
  * at k ≤ 256 — 32× for the 64-dim corpus here) and query distance
  * is a sum of `m` lookups into a per-query table (asymmetric
  * distance computation, ADC) — no float-vector arithmetic per row at
  * query time. (Ref analog: the per-layer weight codebooks of the
  * chip's quantized deployment path, /root/reference/tools/
  * quantize_model.py:60-118 — a codebook trained offline, applied as
  * pure lookups at inference.)
  *
  * Scale shape:
  *  - training runs ALL m subspaces in ONE distributed aggregate per
  *    Lloyd iteration over the exploded (subspace, sub-vector) rows —
  *    m·k·subDim doubles to the driver per iteration, corpus never
  *    collected;
  *  - encoding is a single projection (argmin over literal
  *    sub-codebooks per subspace) — shuffle-free, and the codes
  *    column is what a 100 TB deployment persists;
  *  - an ADC query broadcasts only the m×k lookup table inside plan
  *    literals, scores with element_at sums, and ranks via
  *    sort+limit (TakeOrderedAndProject — per-partition top-k then a
  *    driver k-merge, never a global sort).
  *
  * Determinism: init is the deterministic id-ordered sample (the
  * IVF/sampledCodebook discipline), updates round to 9 dp (vecSumAgg
  * adds in partition order — rounding pins the codebook across
  * shuffle widths), fixed iteration count. L2 distance is used
  * throughout: for the unit-norm corpus ‖q−x‖² = 2−2·cos, so the L2
  * ranking IS the cosine ranking. */
object ProductQuantizer {

  final case class Model(m: Int, k: Int, subDim: Int,
                         codebooks: Array[Array[Array[Double]]])

  /** The m sub-vector slices of a vector column (1-based slice). */
  private def subSlices(vec: Column, m: Int, subDim: Int): Seq[Column] =
    (0 until m).map(s => slice(vec, s * subDim + 1, subDim))

  /** argmin-L2 cell of a sub-vector under subspace `sub`'s codebook —
    * the compiled PqNearestExpr kernel (ties to the lowest cell id).
    * The combinator spelling (greatest over k structs × m subspaces)
    * unrolls m·k·subDim arithmetic and breaches janino's 64 KB
    * method limit at m=16, k=32, silently de-codegening the whole
    * encode stage; the kernel keeps generated code constant-size with
    * the codebooks as a plan reference object. */
  private def nearestSub(books: Array[Array[Array[Double]]], subDim: Int)
                        (sub: Column, sv: Column): Column = {
    val flat = books.flatMap(_.flatten)
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.PqNearestExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expr(sub),
        org.apache.spark.sql.graftshim.ColumnBridge.expr(sv),
        books.length, books(0).length, subDim, flat))
  }

  /** Train per-subspace codebooks: deterministic id-ordered sample
    * init, `iters` Lloyd steps, all subspaces in one aggregate per
    * step. */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
          m: Int, k: Int, iters: Int = 5): Model = {
    val dim = corpus.select(size(col(vecCol))).take(1).headOption match {
      case Some(r) => r.getInt(0)
      case None => throw new IllegalArgumentException(
        s"ProductQuantizer.fit: corpus is empty — cannot derive dim from '$vecCol'")
    }
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    // init: sub-slices of the first k vectors by id (bounded fetch —
    // an index-build step, k×dim doubles)
    val sample = corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    // A corpus smaller than k yields sample.length centroids; the
    // Model reports THAT k (kEff) so kernels/LUTs never index past
    // the real codebook (stale-metadata guard).
    val kEff = sample.length
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m)(s => sample.map(_.slice(s * subDim, (s + 1) * subDim)))
    // exploded (subspace, sub-vector) rows — built once, reused every
    // iteration; vecSumAgg's input contract is array<float>
    val subRows = corpus.select(posexplode(
        array(subSlices(col(vecCol), m, subDim).map(_.cast("array<float>")): _*))
      .as(Seq("sub", "sv")))
    val cached = subRows.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var it = 0
      while (it < iters) {
        // per-subspace assignment: ONE kernel call — `sub` picks the
        // codebook inside the compiled loop
        val cell = nearestSub(books, subDim)(col("sub"), col("sv"))
        val sums = cached
          .select(col("sub"), cell.as("cell"), col("sv"))
          .groupBy(col("sub"), col("cell"))
          .agg(count(lit(1)).as("n"),
            graft.functions.VecAggregates.vecSumAgg(col("sv")).as("s"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) ->
            (r.getLong(2), r.getSeq[Double](3).toArray))
          .toMap
        books = Array.tabulate(m) { s =>
          // empty cells (duplicate init vectors make them permanent
          // under keep-old) are deterministically re-seeded by
          // splitting the subspace's largest cell: its mean plus a
          // cell-indexed 1e-6 offset on one coordinate — the classic
          // empty-cluster repair, order-independent.
          val counts = Array.tabulate(kEff)(c =>
            sums.get((s, c)).map(_._1).getOrElse(0L))
          val largest = counts.indexOf(counts.max)
          books(s).zipWithIndex.map { case (old, c) =>
            sums.get((s, c)) match {
              case Some((n, vsum)) if n > 0 =>
                vsum.map(x => math.rint(x / n * 1e9) / 1e9)
              case _ if counts(largest) > 0L =>
                val donorN = counts(largest)
                val donor = sums((s, largest))._2
                  .map(x => math.rint(x / donorN * 1e9) / 1e9)
                // offset magnitude is keyed by the FULL cell index —
                // a (c % subDim, c % 7) key collides for cells
                // congruent mod lcm(subDim, 7), recreating the
                // permanent-duplicate problem this repair fixes
                donor.zipWithIndex.map { case (x, j) =>
                  if (j == c % subDim) x + 1e-6 * (c + 1) else x }
              case _ => old
            }
          }
        }
        it += 1
      }
    } finally cached.unpersist(blocking = false)
    Model(m, kEff, subDim, books)
  }

  /** Encode the corpus: id + the m-code array (one shuffle-free
    * projection; this is the artifact a deployment persists). */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             model: Model): DataFrame = {
    val codes = (0 until model.m).map { s =>
      nearestSub(model.codebooks, model.subDim)(
        lit(s), slice(col(vecCol), s * model.subDim + 1, model.subDim))
    }
    corpus.select(col(idCol).as("id"), array(codes: _*).as("codes"))
  }

  /** Per-query m×k lookup table of exact sub-distances ‖q_s − c‖²
    * (computed on the driver — m·k·subDim flops, an O(µs) constant). */
  private def lutFor(model: Model, probe: Array[Double]): Array[Array[Double]] =
    Array.tabulate(model.m) { s =>
      val q = probe.slice(s * model.subDim, (s + 1) * model.subDim)
      model.codebooks(s).map { c =>
        var d = 0.0
        var i = 0
        while (i < c.length) { val t = q(i) - c(i); d += t * t; i += 1 }
        math.rint(d * 1e9) / 1e9
      }
    }

  /** The ADC score column: m lookups into the literal LUT, summed. */
  private def adcDist(model: Model, lut: Array[Array[Double]]): Column =
    (0 until model.m).map { s =>
      // element_at(codes, s+1) is this row's 0-based code for subspace
      // s; get() indexes the literal LUT 0-based with a Column index
      get(array(lut(s).map(lit): _*), element_at(col("codes"), s + 1))
    }.reduce(_ + _)

  /** ADC top-k: LUT in plan literals, scored distributedly as m
    * element lookups per row. */
  def adcTopK(encoded: DataFrame, probe: Array[Float], model: Model,
              k: Int): DataFrame = {
    require(probe.length == model.m * model.subDim,
      s"probe dim ${probe.length} != ${model.m}×${model.subDim}")
    encoded
      .select(col("id"),
        round(adcDist(model, lutFor(model, probe.map(_.toDouble))), 6).as("adc_dist"))
      .orderBy(col("adc_dist").asc_nulls_last, col("id").asc)
      .limit(k)
  }

  /** ADC retrieve + exact re-rank — the production PQ query shape
    * (Jégou '11 §V's IVFADC refinement): the codes-only ADC pass
    * prunes the corpus to a `shortlist`, whose ORIGINAL vectors are
    * then scored exactly and cut to k. The shortlist is k-sized (a
    * driver-side TakeOrderedAndProject result), so the re-rank join
    * broadcasts it back onto the corpus — the only full-corpus work
    * remains the lookup-sum scan. Quantization error then costs
    * recall only when a true neighbor falls outside the ENTIRE
    * shortlist, not when codes merely reorder the top-k
    * (recall floor asserted in SimilaritySearchSpec). */
  def adcTopKRefined(encoded: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, probe: Array[Float],
                     model: Model, k: Int, shortlist: Int = 50): DataFrame = {
    val short = adcTopK(encoded, probe, model, shortlist).select(col("id"))
    val candidates = corpus.join(broadcast(short),
      corpus(idCol) === short("id")).drop("id")
    SimilaritySearch.bruteForceTopK(candidates, idCol, vecCol, probe, k)
  }

  // -------------------------------------------------------------
  // IVF-PQ: coarse cells + PQ on RESIDUALS — the composed index the
  // production vector stores ship (Jégou '11 §V, IVFADC). The coarse
  // quantizer prunes the SCAN (only nProbe cells are read — at 100 TB
  // the cell is a partition column, so pruning is file skipping); the
  // residual PQ prunes the BYTES (m codes per vector). Encoding the
  // residual vec − centroid[cell], not the raw vector, roughly halves
  // quantization error: residuals concentrate near the origin where
  // the sub-codebooks have all their resolution.
  // -------------------------------------------------------------

  final case class IvfPq(cells: Array[Array[Double]], model: Model,
                         encoded: DataFrame /* (id, cell, codes) */)

  /** The residual columns: cell assignment (argmax dot over the
    * literal coarse codebook) + vec − centroid[cell] via a 2-D
    * literal lookup. */
  private def cellAndResidual(cells: Array[Array[Double]], vecCol: String)
      : (Column, Column) = {
    val scored = cells.zipWithIndex.map { case (c, i) =>
      struct(graft.functions.VectorFunctions.vecDot(col(vecCol),
        array(c.map(lit): _*)).as("score"), lit(i).as("cell"))
    }
    val cell = greatest(scored: _*).getField("cell")
    val centroidLit = array(cells.map(c => array(c.map(lit): _*)): _*)
    val resid = zip_with(col(vecCol),
      get(centroidLit, col("_cell")), (x, y) => x.cast("double") - y)
    (cell, resid)
  }

  /** Index build: assign cells, PQ-fit on residuals, encode. */
  def fitIvfPq(corpus: DataFrame, idCol: String, vecCol: String,
               cells: Array[Array[Double]], m: Int, k: Int,
               iters: Int = 5): IvfPq = {
    val (cellCol, residCol) = cellAndResidual(cells, vecCol)
    val resid = corpus
      .withColumn("_cell", cellCol)
      .withColumn("_rv", residCol.cast("array<float>"))
      .select(col(idCol).as("id"), col("_cell").as("cell"), col("_rv"))
    val model = fit(resid, "id", "_rv", m, k, iters)
    val encoded = encode(resid, "id", "_rv", model)
      .join(resid.select(col("id"), col("cell")), Seq("id"))
    IvfPq(cells, model, encoded)
  }

  /** IVF-PQ query: the probe's nProbe best cells are scanned, each
    * scored against ITS OWN residual LUT (probe − centroid[cell]),
    * the per-cell branches unioned, shortlisted, and exactly
    * re-ranked. At 100 TB each branch is a partition-pruned scan; the
    * union is a union of pruned scans, never a full pass. */
  def ivfPqTopK(index: IvfPq, corpus: DataFrame, idCol: String,
                vecCol: String, probe: Array[Float], k: Int,
                nProbe: Int = 4, shortlist: Int = 50): DataFrame = {
    val p = probe.map(_.toDouble)
    val probeCells = index.cells.zipWithIndex
      .map { case (c, i) => (c.zip(p).map { case (x, y) => x * y }.sum, i) }
      .sortBy(-_._1).take(nProbe).map(_._2)
    val branches = probeCells.map { c =>
      val residProbe = p.zip(index.cells(c)).map { case (x, y) => x - y }
      index.encoded.filter(col("cell") === c)
        .select(col("id"),
          round(adcDist(index.model, lutFor(index.model, residProbe)), 6)
            .as("adc_dist"))
    }
    val short = branches.reduce(_ unionByName _)
      .orderBy(col("adc_dist").asc_nulls_last, col("id").asc)
      .limit(shortlist)
      .select(col("id"))
    val candidates = corpus.join(broadcast(short),
      corpus(idCol) === short("id")).drop("id")
    SimilaritySearch.bruteForceTopK(candidates, idCol, vecCol, probe, k)
  }
}
