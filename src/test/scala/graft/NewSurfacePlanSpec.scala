package graft

/** Plan-shape pins for the round-12 surface gates, so an engine
  * upgrade that silently changes strategy fails a test instead of a
  * bench number.
  */
class NewSurfacePlanSpec extends SparkTestBase {

  test("collated_join plans a key-equi SortMergeJoin, never a loop") {
    // Collated strings don't support binary equality, so Spark
    // declines hash joins and must sort-merge on the collation
    // order — still shuffle-on-key. If an upgrade degrades this to
    // BroadcastNestedLoopJoin the case-insensitive join stops being
    // usable at scale and this pin fails.
    val df = SparkEntry.queries("collated_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"expected a collation-aware SortMergeJoin:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"collated join degraded to a loop join:\n$plan")
  }

  test("bitmap rollup aggregates bitmaps, never expands distincts") {
    // The whole point of the bitmap path is ONE aggregation pass per
    // level with O(bucket) state — a plan that falls back to
    // count(DISTINCT) expansion (an Expand node) defeats it.
    val df = SparkEntry.queries("bitmap_distinct_rollup")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"bitmap rollup fell back to distinct expansion:\n$plan")
    // bitmap_construct_agg plans as a SortAggregate with a visible
    // partial_ stage — the map-side combine is what makes the rollup
    // one pass per level.
    assert(plan.contains("bitmap_construct_agg"),
      s"expected the native bitmap aggregate path:\n$plan")
    assert(plan.contains("partial_bitmap_construct_agg"),
      s"bitmap build lost its map-side partial stage:\n$plan")
  }

  test("bitmap __all__ row equals the union of per-type user sets") {
    val rows = SparkEntry.queries("bitmap_distinct_rollup")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val exactAll = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows("__all__") == exactAll,
      "bitmap or-merge must dedup users across event types")
    // Users fire several event types, so the naive sum of per-type
    // distincts must OVERCOUNT — proving the merge actually dedups
    // rather than summing.
    val naiveSum = rows.filter(_._1 != "__all__").values.sum
    assert(naiveSum > exactAll,
      "fixture degenerate: per-type user sets never overlap, the " +
        "merge-dedup assertion is vacuous")
  }

  test("approx_top_k is exact in the tracked regime") {
    val got = SparkEntry.queries("approx_top_k_events")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (item, cnt) => (-cnt, item) }
    assert(got.toSeq == exact.toSeq,
      "approx_top_k with capacity >= cardinality must be exact")
  }
}
