package graft

import org.apache.spark.sql.functions._

/** Join-strategy hints — the per-query override when the planner's
  * stats-based choice is wrong for a workload the user understands
  * better (a "small" table that explodes after filters, a broadcast
  * that would OOM). The hint must actually flip the physical operator.
  */
class JoinHintSpec extends SparkTestBase {

  private def joined(hint: String) = {
    val ord = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir).hint(hint)
    ord
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"))
  }

  private def planOf(hint: String): String =
    joined(hint).queryExecution.executedPlan.toString

  test("merge hint forces a sort-merge join") {
    assert(planOf("merge").contains("SortMergeJoin"))
  }

  test("shuffle_hash hint forces a shuffled hash join") {
    assert(planOf("shuffle_hash").contains("ShuffledHashJoin"))
  }

  test("broadcast hint forces a broadcast hash join") {
    assert(planOf("broadcast").contains("BroadcastHashJoin"))
  }

  test("hinted strategies all produce the same result") {
    val expected =
      joined("merge").orderBy("c_mktsegment").collect().toSeq
    Seq("shuffle_hash", "broadcast").foreach { h =>
      assert(
        joined(h).orderBy("c_mktsegment").collect().toSeq == expected,
        s"$h strategy changed the result")
    }
  }
}
