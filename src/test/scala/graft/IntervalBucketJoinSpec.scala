package graft

import org.apache.spark.sql.functions._

/** The interval-join scale property: `join_interval_bucket` must plan
  * the point-in-interval contact as an EQUI-join on the week bucket —
  * never the BroadcastNestedLoopJoin/CartesianProduct a raw inequality
  * predicate degenerates to (every point × every window at 100 TB).
  */
class IntervalBucketJoinSpec extends SparkTestBase {

  test("bucketed interval join plans equi, raw inequality plans BNLJ") {
    val df = graft.operators.RelationalQueries
      .queries("join_interval_bucket")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(
      !plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
      s"bucketed interval join must not nested-loop:\n$plan")
    assert(
      plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
        || plan.contains("BroadcastHashJoin"),
      s"expected a hash/merge equi-join on the bucket key:\n$plan")

    // Differential evidence: the SAME semantics as a raw interval
    // predicate has no equi-key, so Spark can only nested-loop it.
    val promo = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderkey") <= 300)
      .select(
        col("o_orderdate").as("w_start"),
        (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("w_end"))
    val raw = Tables.lineitem(spark, sfDir)
      .join(
        promo,
        col("l_shipdate") >= col("w_start") &&
          col("l_shipdate") < col("w_end"))
    val rawPlan = raw.queryExecution.executedPlan.toString
    assert(
      rawPlan.contains("BroadcastNestedLoopJoin") ||
        rawPlan.contains("CartesianProduct"),
      s"raw inequality join unexpectedly found an equi plan:\n$rawPlan")

    // And the two forms agree on the answer.
    val bucketed = df.agg(sum("n_shipments")).collect()(0).getLong(0)
    val rawCount = raw.count()
    assert(bucketed == rawCount)
  }
}
