package graft

/** Scale-safety plan assertions for the round-7 additions (IVF-PQ,
  * DSIR weighting, the batching/eval reports).
  *
  * The audit convention is COVERAGE.md's: zero CartesianProduct nodes
  * anywhere, and every BroadcastNestedLoopJoin bounded by a CONSTANT
  * side (a fixed centroid set or a one-row aggregate), never by N.
  * These specs pin the node COUNTS, so a refactor that accidentally
  * turns a key-equi join into an all-pairs join (the failure mode
  * that works at sf0.01 and melts at 100 TB) fails loudly here even
  * though the result values would still oracle-match.
  */
class NewOpsPlanSpec extends SparkTestBase {

  private def executedPlan(name: String): String =
    SparkEntry
      .queries(name)(spark, sfDir)
      .queryExecution
      .executedPlan
      .toString

  private def countOf(plan: String, node: String): Int =
    node.r.findAllMatchIn(plan).length

  test("ivfpq_topk: no cartesian; BNLJ only against the centroid set") {
    val plan = executedPlan("ivfpq_topk")
    assert(!plan.contains("CartesianProduct"),
      s"ivfpq_topk must never plan a cartesian:\n$plan")
    // ivfCandidates runs the centroid assignment twice (query probes
    // at nprobe=2, candidate cells at nprobe=1); each is a crossJoin
    // against the broadcast K=8 centroid frame — the two permitted,
    // constant-bounded nested-loop joins. Everything else (candidate
    // cell join, recon join, query join) must be a key-equi join.
    assert(countOf(plan, "BroadcastNestedLoopJoin") <= 2,
      s"unexpected nested-loop join beyond the centroid scans:\n$plan")
  }

  test("dsir_weights: no cartesian; BNLJ only for the one-row totals") {
    val plan = executedPlan("dsir_weights")
    assert(!plan.contains("CartesianProduct"),
      s"dsir_weights must never plan a cartesian:\n$plan")
    // The only nested-loop join is the crossJoin of the 64-bucket
    // table with the ONE-ROW totals aggregate; the token stream
    // reaches the weights through a key-equi join on bucket id.
    assert(countOf(plan, "BroadcastNestedLoopJoin") <= 1,
      s"the token stream must join weights by key:\n$plan")
  }

  test("retrieval_eval and matryoshka_recall: no cartesian") {
    for (name <- Seq("retrieval_eval", "matryoshka_recall")) {
      val plan = executedPlan(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name must never plan a cartesian:\n$plan")
    }
  }

  test("padding_efficiency windows are shard-partitioned") {
    val plan = executedPlan("padding_efficiency")
    assert(!plan.contains("CartesianProduct"))
    // A global (unpartitioned) row_number would be the single-funnel
    // anti-pattern; the window spec must carry the shard key.
    assert(plan.contains("partitionspec") ||
      plan.toLowerCase.contains("partition"),
      s"expected shard-partitioned window:\n$plan")
    assert(!plan.contains("Window [") ||
      plan.contains("windowspecdefinition(shard"),
      s"window must partition by shard:\n$plan")
  }

  test("corr_matrix: one aggregation pass, no cartesian") {
    val plan = executedPlan("corr_matrix")
    assert(!plan.contains("CartesianProduct"))
    // The whole point is ONE sufficient-statistics pass: exactly one
    // aggregation pair (partial+final) over the per-order frame plus
    // the per-order rollup itself — a corr()-per-pair refactor would
    // multiply the HashAggregate count.
    val nAgg = countOf(plan, "HashAggregate")
    assert(nAgg <= 4,
      s"expected one sufficient-stats pass (≤4 HashAggregates incl. " +
        s"partials), got $nAgg:\n$plan")
  }

  test("lsh_param_sweep and image_hist_lsh: no cartesian") {
    Seq("lsh_param_sweep", "image_hist_lsh").foreach { name =>
      val plan = executedPlan(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name must never plan a cartesian:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name candidates must come from key-equi band joins:\n$plan")
    }
  }
}
