package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the clustering step that
  * turns near-duplicate PAIRS (q61/q62/q63/q71 output) into dedup
  * CLUSTERS with one canonical document each. The reference has no
  * native equivalent (its dedup surface stops at pair emission); every
  * production dedup pipeline needs this step, so it is first-class
  * here.
  *
  * Algorithm: iterative minimum-label propagation. Each node starts
  * labeled with itself; every round each node takes the min of its own
  * label and its neighbors' labels; stop when a round changes nothing.
  * Rounds needed = graph diameter — near-dup clusters are small and
  * dense (diameter ≤ a few hops), so this converges in 2–4 rounds.
  * Each round is one shuffle join + one aggregation, all DataFrame ops
  * (AQE-planned); for adversarial long-chain graphs the standard
  * star-contraction variant halves the diameter per round — same
  * contract, swap the loop body.
  *
  * The convergence check is a single aggregate per round (max of
  * label-changed flags) — O(1) driver data, no collect of labels.
  */
object Components {

  /** edges: two integral columns (a, b). Returns (id, cluster) where
    * cluster = min node id reachable — deterministic under any
    * partitioning.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val cols = edges.columns
    val e0 = edges.select(col(cols(0)).as("a"), col(cols(1)).as("b"))
    // symmetric closure, one row per direction
    val sym = e0.unionByName(e0.select(col("b").as("a"), col("a").as("b"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // localCheckpoint (not just persist) each round: an iterative
    // DataFrame whose plan references the previous round's plan grows
    // its lineage exponentially — by round ~30 the plan tree alone OOMs
    // the driver. Checkpointing truncates lineage to the materialized
    // partitions, the standard iterative-algorithm posture (GraphX
    // does the same).
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // min neighbor label per node (pre-aggregated BEFORE the join
      // with own labels — less data through the join, and no
      // Union-of-join plan, whose constraint propagation chokes on the
      // duplicate attribute ids of an iterated self-referential plan)
      val neigh = sym.join(labels, sym("b") === labels("id"))
        .select(sym("a").as("id"), col("cluster"))
        .groupBy("id").agg(min(col("cluster")).as("ncl"))
      val prop = labels.join(neigh, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("ncl"), col("cluster"))).as("cluster"))
        .localCheckpoint(true)
      // pointer jumping (path compression): cluster := cluster's
      // cluster. Together with the neighbor step this halves the
      // remaining path depth per round — O(log diameter) rounds total,
      // so even adversarial long chains converge in ~log2(n) shuffles
      // instead of n.
      val next = prop.as("p")
        .join(prop.select(col("id").as("cid"), col("cluster").as("cc")).as("q"),
          col("p.cluster") === col("cid"), "left")
        .select(col("p.id").as("id"),
          coalesce(col("cc"), col("p.cluster")).as("cluster"))
        .localCheckpoint(true)
      val changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.cluster") =!= col("o.cluster"))
        .limit(1).count() // any-change probe, stops at the first hit
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist(blocking = true)
    labels
  }

  /** Convenience: components + per-cluster size, for dedup reporting. */
  def dedupClusters(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val comp = connectedComponents(edges, maxIter)
    val sizes = comp.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "cluster")
      .select(col("id").as("doc_id"), col("cluster").as("cluster_id"), col("cluster_size"))
  }
}
