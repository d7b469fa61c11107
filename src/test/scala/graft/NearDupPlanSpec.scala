package graft

/** Scale-safety plan assertions for the near-dup candidate joins.
  *
  * The sizes/signature tables in `ngram_jaccard` and
  * `minhash_band_pairs` hold one row PER DOCUMENT — at 100 TB that is
  * billions of rows, so an unconditional `broadcast()` hint on them is
  * a guaranteed executor OOM. These specs prove no such hint exists:
  * with `autoBroadcastJoinThreshold = -1` the planner only ever emits
  * a BroadcastExchange when a hint forces it, so an exchange-free plan
  * under that setting means every candidate→attribute join shuffles on
  * its keys (stats-based broadcasting at small SF remains allowed in
  * normal runs — that is size-aware and safe).
  */
class NearDupPlanSpec extends SparkTestBase {

  /** The plan-bearing frame per query: `ngram_jaccard` serves its
    * result from the eagerly pinned per-session memo (whose static
    * plan is just the pinned scan), so its candidate-join shape is
    * asserted on the underlying builder — the same
    * guard-the-building-block caveat COVERAGE.md documents for
    * dedup_clusters.
    */
  private def planFrame(name: String) = name match {
    case "ngram_jaccard" =>
      graft.operators.TextQueries.computeJaccardPairs(spark, sfDir)
    case _ => SparkEntry.queries(name)(spark, sfDir)
  }

  private def assertNoForcedBroadcast(name: String): Unit = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = planFrame(name)
      val plan = df.queryExecution.executedPlan.toString
      assert(
        !plan.contains("BroadcastExchange"),
        s"$name must not broadcast a per-document table:\n$plan")
      assert(
        !plan.contains("BroadcastNestedLoopJoin") &&
          !plan.contains("CartesianProduct"),
        s"$name must join on keys, never all-pairs:\n$plan")
      // Still produces the pinned result shape under the forced
      // shuffle-join plan (values are pinned by the DuckDB oracle).
      assert(df.count() > 0, s"$name returned no rows")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("ngram_jaccard plans without forced broadcasts") {
    assertNoForcedBroadcast("ngram_jaccard")
  }

  test("minhash_band_pairs plans without forced broadcasts") {
    assertNoForcedBroadcast("minhash_band_pairs")
  }

  /** Aggregation-state bound: every `collect_set` posting-list build
    * must sit ABOVE a key-filtering join (the count-then-semi-join
    * pre-filter). A collect_set whose subtree has no join aggregates
    * the raw exploded rows, which materializes a hot key's FULL
    * posting list in one buffer before any size cap can drop it —
    * executor OOM at 100 TB.
    */
  private def assertCollectSetBounded(name: String): Unit = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.CollectSet
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val df = planFrame(name)
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate
          if a.aggregateExpressions.exists(
            _.exists(_.isInstanceOf[CollectSet])) =>
        a
    }
    assert(aggs.nonEmpty, s"$name: expected a collect_set aggregation")
    aggs.foreach { a =>
      assert(
        a.collectFirst { case j: Join => j }.isDefined,
        s"$name: collect_set aggregates unfiltered rows (no key-count " +
          s"pre-filter join below it):\n$a")
    }
  }

  test("ngram_jaccard bounds collect_set state with a key pre-filter") {
    assertCollectSetBounded("ngram_jaccard")
  }

  test("minhash_band_pairs bounds collect_set state with a key pre-filter") {
    assertCollectSetBounded("minhash_band_pairs")
  }
}
