package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the "collapse near-dup
  * pairs into clusters, keep one canonical doc per cluster" step of a dedup
  * pipeline (pair emitters: [[Dedup]] / [[Similarity]] families).
  *
  * Min-label propagation accelerated by pointer jumping: each round a node
  * takes the min label among (itself, its neighbors) and then follows its own
  * label one hop (`label := label(label)`), which doubles the distance a
  * component-min travels per round — so rounds are O(log diameter), not
  * O(diameter). Near-dup graphs are overwhelmingly tiny cliques and short
  * chains (1-2 rounds); `maxIters` bounds pathological chains at 2^maxIters
  * diameter. Loop control is driver-side but each round is exactly ONE
  * distributed job: the new labels are materialized with a `changed` flag
  * (fused convergence check), and the fixpoint test is a scan of the
  * just-checkpointed blocks — no separate convergence join. Labels are
  * `localCheckpoint`ed so lineage doesn't grow by three joins per round.
  *
  * Fully deterministic under any partitioning: min is order-insensitive.
  *
  * Correctness sketch: labels start as self-ids and only decrease via mins of
  * labels reachable along edges, so label(v) is always the id of a node in
  * v's component with label(v) <= v. At fixpoint min over neighbor labels >=
  * label(v) for every v; edges are propagated both directions, so labels are
  * equal across every edge, hence constant per component; the constant is a
  * member id and the member carrying it labels itself, forcing it to the
  * component minimum.
  */
object ConnectedComponents {

  /** (node, cluster_id) for every node appearing in `pairs`; cluster_id =
    * the minimum node id of the component.
    */
  def components(pairs: DataFrame, aCol: String, bCol: String,
                 maxIters: Int = 20): DataFrame = {
    // undirected: propagate along both directions. Checkpoint the pair
    // source BEFORE the direction union — the source is typically an
    // expensive dedup pipeline (an LSH candidate join for dedup_clusters),
    // and a union of two selects over the raw frame would execute it once
    // per branch.
    val p0 = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .localCheckpoint()
    val edges = p0.union(p0.select(col("dst").as("src"), col("src").as("dst")))
    var labels = edges.select(col("src")).distinct()
      .select(col("src").as("node"), col("src").as("label"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(edges("src").as("nb_node"))
        .agg(min(col("label")).as("nb_min"))
      val l1 = labels
        .join(neighborMin, labels("node") === col("nb_node"), "left")
        .select(col("node"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nb_min"), col("label"))).as("label"))
      // pointer jump: label(v) is itself a node id, so follow it one hop —
      // label := min(label, label(label)). The left join can only miss when
      // the graph is empty (label values are node ids of this frame).
      val hop = l1.select(col("node").as("p_node"), col("label").as("p_label"))
      val jumped = least(col("label"), coalesce(col("p_label"), col("label")))
      val next = l1
        .join(hop.as("h"), l1("label") === col("h.p_node"), "left")
        .select(col("node"), jumped.as("label"),
          (jumped < col("old_label")).as("changed"))
        .localCheckpoint() // ONE job: new labels + changed flags together
      // fused fixpoint test: scans the checkpointed blocks, no extra join
      converged = next.filter(col("changed")).isEmpty
      labels = next.drop("changed")
      iter += 1
    }
    labels.select(col("node"), col("label").as("cluster_id"))
  }
}
