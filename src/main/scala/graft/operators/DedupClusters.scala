package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the step
  * that turns MinHash/SimHash candidate PAIRS into duplicate GROUPS
  * with one canonical survivor each (the reference has no analog; its
  * nearest concept is attention grouping, SURVEY §2.8 — dedup is a
  * north-star addition).
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with the smallest id among itself and its direct
  * neighbors; each round replaces a node's label with the minimum
  * label in its closed neighborhood. Labels are monotonically
  * non-increasing and bounded below by the component minimum, so the
  * fixpoint (no label changed) is exact connected components with
  * the component's min id as its deterministic canonical
  * representative.
  *
  * Scale shape: each round is one join of the edge list against the
  * current label table (shuffle on node id) + a min-aggregate —
  * O(E) work per round, O(component diameter) rounds. Near-dup
  * graphs are overwhelmingly short-diameter (dup clusters are
  * near-cliques: most converge in 2-3 rounds), which is why plain
  * propagation is the right spelling here; a ln(n)-round
  * large-star/small-star variant only pays off on long-chain graphs
  * that dedup inputs don't produce. Lineage is truncated per round
  * (localCheckpoint) so the plan doesn't grow with iterations — the
  * standard iterative-algorithm discipline on Spark. */
object DedupClusters {

  /** Components of the undirected graph given as a pair list.
    * Returns `(node, cluster)` — every node that appears in a pair,
    * labeled with its component's minimum node id.
    *
    * `maxIter` bounds the rounds (diameter guard); the loop exits as
    * soon as a round changes nothing. Ids must be orderable
    * (long/int/string). */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame = {
    // undirected: both directions, deduplicated
    val edges = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .union(pairs.select(col(bCol).as("a"), col(aCol).as("b")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // closed-neighborhood minimum as the initial label:
    // min over rows of least(a, b) = least(a, min(b))
    var labels = edges.groupBy(col("a").as("node"))
      .agg(min(least(col("a"), col("b"))).as("cluster"))
      .localCheckpoint(true)

    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxIter) {
      // each node offers its label to every neighbor; a node keeps
      // the min of its own label and all offers
      val offers = edges
        .join(labels.withColumnRenamed("node", "a"), Seq("a"))
        .groupBy(col("b").as("node"))
        .agg(min(col("cluster")).as("offer"))
      val next = labels.join(offers, Seq("node"), "left")
        .select(col("node"),
          least(col("cluster"), coalesce(col("offer"), col("cluster"))).as("cluster"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("cluster", "old"), Seq("node"))
        .filter(col("cluster") < col("old")).count()
      labels.unpersist(blocking = false)
      labels = next
      round += 1
    }
    edges.unpersist(blocking = false)
    labels
  }

  /** Cluster rollup: component id (= canonical keep id), member
    * count, member id checksum — the reviewable dedup report. Only
    * docs that appear in at least one pair show up; everything else
    * is its own singleton cluster by definition. */
  def clusterStats(components: DataFrame): DataFrame =
    components.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"), sum(col("node")).as("id_sum"))
}
