package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank power iteration over an edge list — the engine's
  * iterative-join graph workload (Page et al. '99; the canonical
  * Spark iterative benchmark). Complements the one-shot graph step
  * already in the engine (DedupClusters.connectedComponents):
  * components answer "which nodes belong together", PageRank ranks
  * influence within the link structure.
  *
  * Unnormalized formulation with dangling-safe updates:
  *   rank'(v) = (1−d) + d · Σ_{u→v} rank(u) / outdeg(u)
  * Nodes with no in-edges settle at (1−d); the iteration is run a
  * fixed `iters` times (deterministic — no convergence probe).
  *
  * Scale shape: per iteration ONE shuffle — contributions group on
  * dst; the (node, outdeg) frame is computed once and reused (it
  * carries the edge fan-out); ranks re-join edges on src each sweep.
  * At cluster scale, edges are pre-partitioned on src and each
  * iteration's join reuses that partitioning, so the only moving
  * bytes are the (dst, contribution) pairs. Rank state is
  * checkpointed every `checkpointEvery` sweeps (Checkpoints.truncate:
  * localCheckpoint locally, reliable FS checkpoint on a cluster via
  * `checkpointDir`): iterative plans otherwise double in depth each
  * sweep and the optimizer re-walks the whole lineage per action (the
  * classic iterative-Spark trap).
  *
  * Determinism: ranks round to 9 dp each sweep (fp summation order
  * varies with partitioning — same discipline as KMeans/lloydStep). */
object PageRank {

  /** edges: (src, dst) long columns, multi-edges allowed (weighted by
    * multiplicity). Returns (node, rank) for every node appearing as
    * src or dst. `checkpointDir = Some(dir)` selects reliable
    * (fault-tolerant-FS) checkpointing for cluster runs — see
    * Checkpoints; results are identical either way (PageRankSpec). */
  def run(edges: DataFrame, iters: Int = 10, damping: Double = 0.85,
          checkpointEvery: Int = 4,
          checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // Measured note: disabling AQE for the iteration (the
    // GraphX-style fixed-partitioner instinct) was tried and is ~2×
    // SLOWER here — AQE's post-shuffle coalescing shrinks the
    // constant-size rank/contrib frames to a handful of tasks per
    // sweep, which outweighs its per-stage re-planning cost. Keep
    // adaptive planning on.
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    // the WEIGHTED fan-out-annotated edge list, computed ONCE and
    // checkpointed — every sweep reuses it. Multi-edges collapse to
    // (src, dst, w): a hot pair contributes w·rank/outdeg in one row
    // instead of w rows — at 100 TB this is the edge-compression that
    // keeps per-sweep shuffle volume bounded by DISTINCT pairs, not
    // raw edge count (identical math: outdeg is the weight sum).
    val weighted = e.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
    val linked = Checkpoints.truncate(
      weighted
        .join(weighted.groupBy(col("src")).agg(sum(col("w")).as("outdeg")),
          Seq("src")),
      checkpointDir) // (src, dst, w, outdeg)
    // Nodes with NO in-edges (they appear only as src) settle at
    // round((1−d) + d·0, 9) from sweep 1 on — a constant frame built
    // once from the checkpointed edge list. Every node WITH an
    // in-edge appears in every sweep's `contribs` (rank always covers
    // all nodes and `linked` holds every distinct (src, dst) pair, so
    // the grouped dst set is exactly the distinct-dst set each
    // sweep). Stamping the constant once and UNIONING it per sweep
    // therefore computes the identical ranks as the former
    // `nodes LEFT JOIN contribs` + coalesce spelling (oracle-pinned)
    // while removing one join per sweep — 8 broadcast builds/probes
    // of the node table gone from the measured entry (guide §2.4:
    // remove shuffles/joins outright when a precomputed frame already
    // carries the answer). `d·0.0` is exact in fp, so the constant is
    // bit-identical to the old coalesce path. With the per-sweep join
    // gone, the full node-universe frame is never needed either: the
    // union of contribs and this frame IS the universe.
    val noInRanks = Checkpoints.truncate(
      linked.select(col("src").as("node")).distinct()
        .join(linked.select(col("dst").as("node")).distinct(),
          Seq("node"), "left_anti")
        .select(col("node"),
          round(lit(1.0 - damping) + lit(damping) * lit(0.0), 9).as("rank")),
      checkpointDir)
    var rank: DataFrame = null
    var i = 0
    while (i < iters) {
      // sweep 1's rank is the constant 1.0 for EVERY node, so its
      // join is a multiplication by lit(1.0) — skip the join, keep
      // the expression shape (w · 1.0 / outdeg ≡ w · r / outdeg at
      // r = 1.0, exact in fp), same 9-dp pin
      val contribs = (
        if (rank == null)
          linked.select(col("dst").as("node"),
            (col("w") * lit(1.0) / col("outdeg")).as("c"))
        else
          linked
            .join(rank.select(col("node").as("src_r"), col("rank").as("r")),
              col("src") === col("src_r"))
            .select(col("dst").as("node"),
              (col("w") * col("r") / col("outdeg")).as("c")))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("contrib"))
      val next = contribs
        .select(col("node"),
          round(lit(1.0 - damping) +
            lit(damping) * col("contrib"), 9).as("rank"))
        .unionByName(noInRanks)
      rank = if ((i + 1) % checkpointEvery == 0 && i + 1 < iters)
        Checkpoints.truncate(next, checkpointDir)
      else next
      i += 1
    }
    rank
  }
}
