package graft

import org.apache.spark.sql.functions._

/** Dynamic partition pruning must actually fire for the dpp_join
  * shape: the pruning predicate exists only at runtime (a filtered
  * dimension), so the fact scan's partition filters must carry a
  * dynamicpruning subquery, and the scan must read strictly fewer
  * partitions than the table has. Static pruning is pinned elsewhere
  * (partitioned_sink_prune); this is the join-driven mechanism.
  */
class DppJoinSpec extends SparkTestBase {

  test("fact scan carries a dynamicpruning filter and prunes") {
    val df = SparkEntry.queries("dpp_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in the fact scan:\n$plan")
    // Ground truth: months present vs months surviving the dim filter.
    val all = Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("m")).distinct()
    val nAll = all.count()
    val nKept = all
      .filter(expr("CAST(substring(m, 9, 2) AS INT) <= 7"))
      .count()
    assert(nKept < nAll, "fixture must have non-first-week days")
    assert(df.count() == nKept,
      "one output row per surviving day partition")
  }
}
