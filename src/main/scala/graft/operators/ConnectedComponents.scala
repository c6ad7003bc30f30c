package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the "collapse near-dup
  * pairs into clusters, keep one canonical doc per cluster" step of a dedup
  * pipeline (pair emitters: [[Dedup]] / [[Similarity]] families).
  *
  * Iterative min-label propagation, the standard distributed CC shape: each
  * round every node takes the min label among itself and its neighbors;
  * fixpoint = every node carries its component's min id. Converges in
  * graph-diameter rounds — near-dup graphs are overwhelmingly tiny cliques
  * and short chains, so the expected round count is 1-3; `maxIters` bounds
  * pathological chains. Loop control is driver-side (one small fixpoint
  * check per round), data stays executor-side; each round's labels are
  * `localCheckpoint`ed so lineage doesn't grow by two joins per round.
  *
  * Fully deterministic under any partitioning: min is order-insensitive.
  */
object ConnectedComponents {

  /** (node, cluster_id) for every node appearing in `pairs`; cluster_id =
    * the minimum node id of the component.
    */
  def components(pairs: DataFrame, aCol: String, bCol: String,
                 maxIters: Int = 20): DataFrame = {
    // undirected: propagate along both directions. Checkpoint the pair
    // source BEFORE the direction union — the source is typically an
    // expensive dedup pipeline (an O(n²) similarity join for
    // dedup_clusters), and a union of two selects over the raw frame would
    // execute it once per branch.
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
      val next = labels
        .join(neighborMin, labels("node") === col("nb_node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nb_min"), col("label"))).as("label"))
        .localCheckpoint()
      converged = next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.label") =!= col("o.label"))
        .isEmpty
      labels = next
      iter += 1
    }
    labels.select(col("node"), col("label").as("cluster_id"))
  }
}
