package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Checkpoints

/** Connected components by alternating large-star / small-star rounds
  * — the CC algorithm whose round count is O(log² n) IN THE GRAPH SIZE
  * regardless of component diameter (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14; the same scheme
  * behind GraphFrames/GraphX CC).
  *
  * Min-label propagation (`dedup_clusters`) needs diameter-many rounds
  * — right for near-dup graphs, whose components are small and dense,
  * and guarded there by a fail-loud cap. THIS operator is the
  * deployable fallback that cap points at: a pathological long-chain
  * component (entity-resolution graphs, social graphs, citation
  * chains) converges here in a handful of rounds where label
  * propagation would need thousands.
  *
  * Every round is two groupBy-min aggregations and two key-equi joins
  * — shuffles on the node key only, per-key aggregation state O(1),
  * nothing driver-side but the O(1) convergence counter. Per-round
  * edge frames pin through `graft.Checkpoints` (reliable-checkpoint
  * tier available, like every iterative operator here).
  *
  * Algorithm, in edge-list form ((u,v), undirected):
  *   large-star: each node u computes m = min(N(u) ∪ {u}); every
  *     STRICTLY LARGER neighbor v > u re-attaches to m.
  *   small-star: orient edges large→small; each u computes m over its
  *     smaller neighbors ∪ itself; all those neighbors (and u) attach
  *     to m.
  *   Alternate until the edge set reaches a fixpoint: a forest of
  *   2-level stars rooted at each component's minimum node.
  */
object TwoStarCC {

  /** (node, component) for every node in `edges` (src/dst long
    * columns; direction irrelevant) — component = min node id, the
    * same labeling min-label propagation and the recursive-CTE oracle
    * produce.
    */
  def components(edges: DataFrame): DataFrame =
    run(edges)._1

  /** Exposed for the spec: also returns the number of alternating
    * rounds until fixpoint.
    */
  private[graft] def run(edges: DataFrame): (DataFrame, Int) = {
    // Canonical undirected form, self-loops dropped: (big, small).
    var cur = Checkpoints.pin(edges
      .select(
        greatest(col("src"), col("dst")).as("big"),
        least(col("src"), col("dst")).as("small"))
      .filter(col("big") =!= col("small"))
      .distinct())
    var rounds = 0
    var converged = false
    val MaxRounds = 60 // >> log²(any real graph); runaway guard only
    while (!converged && rounds < MaxRounds) {
      val next = Checkpoints.pin(smallStar(largeStar(cur)))
      // Fixpoint = identical edge SETS. Both frames are distinct, so
      // equal cardinality + one empty difference decides exactly —
      // a count (cheap over the pinned frame) replaces the second
      // anti-join pass.
      converged = next.count() == cur.count() && next.exceptAll(cur).isEmpty
      Checkpoints.unpin(cur)
      cur = next
      rounds += 1
    }
    require(converged,
      s"two-star CC did not converge within $MaxRounds rounds")
    // Star edges point node→root; roots label themselves. Nodes the
    // fixpoint never saw — present in the INPUT only via self-loops,
    // which the canonicalization drops — are singletons labeled by
    // themselves (the contract is "every node in `edges`"; found by
    // TwoStarCCPropsSpec's random multigraphs). The label frame is
    // pinned so the final edge generation can be released — callers
    // (and the per-session memo in TextQueries) hold ONE bounded
    // frame, not the whole fixpoint chain.
    val starLabels = cur
      .select(col("big").as("node"), col("small").as("component"))
      .unionByName(cur.select(col("small").as("node"),
        col("small").as("component")))
      .groupBy("node")
      .agg(min(col("component")).as("component"))
    val allNodes = edges
      .select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct()
    val labels = Checkpoints.pin(allNodes
      .join(starLabels, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("component"), col("node")).as("component")))
    Checkpoints.unpin(cur)
    (labels, rounds)
  }

  /** Large-star over canonical (big, small) edges: for every node u,
    * neighbors larger than u re-attach to min(N(u) ∪ {u}). Emitted
    * back in canonical orientation (attachment target is the minimum,
    * so pairs are already (larger, smaller)).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("big").as("u"), col("small").as("v"))
      .unionByName(e.select(col("small").as("u"), col("big").as("v")))
    val mins = sym.groupBy("u")
      .agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    sym.filter(col("v") > col("u"))
      .join(mins, "u")
      .select(col("v").as("big"), col("m").as("small"))
      .filter(col("big") =!= col("small"))
      .distinct()
  }

  /** Small-star over canonical (big, small) edges: every node u with
    * smaller neighbors attaches them (and itself) to their collective
    * minimum.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("big").agg(min(col("small")).as("m"))
    val moved = e.join(mins, "big")
      .select(col("small").as("node"), col("m"))
      .unionByName(mins.select(col("big").as("node"), col("m")))
    moved
      .select(
        greatest(col("node"), col("m")).as("big"),
        least(col("node"), col("m")).as("small"))
      .filter(col("big") =!= col("small"))
      .distinct()
  }
}
