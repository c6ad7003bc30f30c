package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the "collapse near-dup
  * pairs into clusters, keep one canonical doc per cluster" step of a dedup
  * pipeline (pair emitters: [[Dedup]] / [[Similarity]] families).
  *
  * Min-label propagation accelerated by pointer jumping: each round a node
  * takes the min label among (itself, its neighbors) and then follows that
  * label one hop through the PREVIOUS round's label table
  * (`label := min(label, label_prev(label))`), which roughly doubles the
  * distance a component-min travels per round — rounds are O(log diameter),
  * not O(diameter). Jumping through the previous (already materialized)
  * table instead of the in-flight one keeps the per-round neighbor-min
  * aggregation evaluated exactly ONCE: the hop side is a checkpointed leaf,
  * so nothing re-executes the join+groupBy subplan (the self-join-on-l1
  * formulation evaluated it twice — no ReusedExchange covers two exchanges
  * with different keys). Staler-by-one-round hops are still valid labels
  * (any label value is a component member's id), so correctness is
  * unaffected; only the acceleration factor is marginally smaller.
  *
  * Label init is fused with the first neighbor-min round: label0(v) =
  * min(v, min neighbors(v)) is ONE groupBy over the edge list — no separate
  * distinct-nodes job, and cliques (the dominant near-dup shape) are fully
  * labeled before the loop even starts, leaving a single confirming round.
  *
  * Loop control is driver-side but each round is exactly one distributed
  * job: new labels are materialized WITH a `changed` flag (fused convergence
  * check); the fixpoint test is a take(1) scan of the just-checkpointed
  * blocks, no separate convergence join.
  *
  * Fully deterministic under any partitioning: min is order-insensitive.
  * Duplicate and self edges are harmless (min absorbs them), so callers can
  * feed raw candidate pairs without paying a distinct.
  *
  * Correctness sketch: labels start at min(self, neighbors) and only
  * decrease via mins of labels reachable along edges or via label-table
  * hops, so label(v) is always the id of a node in v's component with
  * label(v) <= v. At fixpoint (no label decreased) the neighbor-min pass
  * gives label(u) >= label(v) for every edge (v,u); edges are propagated
  * both directions, so labels are equal across every edge, hence constant
  * per component; the constant is a member id and the member carrying it
  * labels itself, forcing it to the component minimum.
  *
  * Materialization: `localCheckpoint` by default — executor-memory lineage
  * truncation, the fast choice for a single-JVM or short-lived job, but a
  * lost executor mid-fixpoint kills the job. For long multi-tenant cluster
  * runs pass `checkpointDir = Some(dir)` (an HDFS/object-store path): rounds
  * then materialize through [[Materialize.reliable]] — each round's labels
  * survive executor loss at the cost of a write to stable storage per round.
  * No global SparkContext state is touched (concurrent components() calls
  * with different dirs don't race), and a superseded round's files are
  * deleted as soon as the next round materializes, so long fixpoints hold at
  * most two rounds of label state on disk (plus the edge snapshot and final
  * labels, which the returned frame still reads — the caller owns the dir
  * and deletes it after consuming the result).
  */
object ConnectedComponents {

  /** (node, cluster_id) for every node appearing in `pairs`; cluster_id =
    * the minimum node id of the component.
    *
    * @param checkpointDir when set, rounds checkpoint RELIABLY to this
    *   directory (fault-tolerant on a real cluster); when None, rounds use
    *   `localCheckpoint` (fastest, but not executor-loss safe).
    * @param inputMaterialized callers whose `pairs` frame is ALREADY eagerly
    *   materialized (e.g. the checkpointed output of a Dedup/Similarity
    *   pair bracket) pass true to skip the redundant edge-snapshot barrier
    *   — the both-directions union then scans the caller's blocks twice,
    *   which is cheaper than re-materializing them. Ignored in reliable
    *   mode: a localCheckpoint input is not executor-loss safe, so the
    *   snapshot is still written to `checkpointDir`.
    */
  def components(pairs: DataFrame, aCol: String, bCol: String,
                 maxIters: Int = 20,
                 checkpointDir: Option[String] = None,
                 inputMaterialized: Boolean = false): DataFrame = {
    // (frame, Some(path)) in reliable mode so a superseded round's files can
    // be deleted the moment the next round lands; (frame, None) otherwise
    def mat(df: DataFrame): (DataFrame, Option[String]) = checkpointDir match {
      case Some(dir) =>
        val (out, path) = Materialize.reliable(df, dir)
        (out, Some(path))
      case None => (df.localCheckpoint(), None)
    }
    // undirected: propagate along both directions. Materialize the pair
    // source BEFORE the direction union — the source is typically an
    // expensive dedup pipeline (an LSH candidate join for dedup_clusters),
    // and a union of two selects over the raw frame would execute it once
    // per branch.
    val skipSnapshot = inputMaterialized && checkpointDir.isEmpty
    if (skipSnapshot) {
      // the flag is a caller PROMISE that `pairs` is already an eager
      // snapshot; verify it instead of trusting it — a lazy pipeline passed
      // here would re-execute per direction branch per round (and a
      // nondeterministic one could yield an inconsistent edge set). Accepted
      // shapes: cheap row-preserving ops (project/filter/sort) over
      // materialized leaves (LogicalRDD from localCheckpoint, LocalRelation,
      // file/relation scans) — anything with a join/aggregate/generate in it
      // is NOT a snapshot and must take the barrier.
      import org.apache.spark.sql.catalyst.plans.logical
      val plan = pairs.queryExecution.optimizedPlan
      val cheapOverLeaves = plan.collect { case n => n }.forall {
        case _: logical.Project | _: logical.Filter | _: logical.Sort => true
        case _: logical.LeafNode => true
        case _ => false
      }
      require(cheapOverLeaves,
        "inputMaterialized=true but the pairs plan is not a materialized " +
          s"snapshot (found non-trivial operators):\n$plan")
    }
    val (p0, _) =
      if (skipSnapshot)
        (pairs.select(col(aCol).as("src"), col(bCol).as("dst")), None)
      else mat(pairs.select(col(aCol).as("src"), col(bCol).as("dst")))
    val edges = p0.union(p0.select(col("dst").as("src"), col("src").as("dst")))
    // fused init == round 1's neighbor-min over self-labels, as one groupBy
    var (labels, labelsPath) = mat(
      edges.groupBy(col("src").as("node"))
        .agg(min(least(col("src"), col("dst"))).as("label")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val nm = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(edges("src").as("nb_node"))
        .agg(min(col("label")).as("nb_min"))
      val l1 = labels.as("cur")
        .join(nm, col("cur.node") === col("nb_node"), "left")
        .select(col("cur.node").as("node"), col("cur.label").as("old_label"),
          least(col("cur.label"), coalesce(col("nb_min"), col("cur.label"))).as("label"))
      // pointer jump through the PREVIOUS round's materialized labels: a
      // leaf on the hop side, so neighbor-min runs once per round
      val hop = labels.select(col("node").as("p_node"), col("label").as("p_label"))
      val jumped = least(col("label"), coalesce(col("p_label"), col("label")))
      val (next, nextPath) = mat(
        l1.join(hop, l1("label") === col("p_node"), "left")
          .select(col("node"), jumped.as("label"),
            (jumped < col("old_label")).as("changed"))) // ONE job: labels + flags
      // the new round is durable — the superseded round's files can go now
      // (reliable mode only; localCheckpoint blocks are ContextCleaner-GC'd)
      labelsPath.foreach(Materialize.delete(labels, _))
      // fused fixpoint test: take(1) over the checkpointed blocks
      converged = next.filter(col("changed")).isEmpty
      labels = next.drop("changed")
      labelsPath = nextPath
      iter += 1
    }
    labels.select(col("node"), col("label").as("cluster_id"))
  }
}
