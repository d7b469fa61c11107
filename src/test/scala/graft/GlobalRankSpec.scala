package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalRank

/** The scalable global row-number helper must be indistinguishable in
  * VALUES from the single-partition window form it replaces — only the
  * plan shape (parallel range shuffle vs one-task WindowExec) differs.
  */
class GlobalRankSpec extends SparkTestBase {

  private val order =
    Seq(col("c_acctbal").asc, col("c_custkey").asc)

  test("withRowNumber ≡ single-partition row_number window") {
    val base =
      Tables.customer(spark, sfDir).select(col("c_acctbal"), col("c_custkey"))
    val viaHelper = GlobalRank
      .withRowNumber(base, order)
      .select(col("c_custkey"), col("rn"))
      .orderBy("rn")
      .collect()
      .toSeq
    val viaWindow = base
      .withColumn("rn", row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select(col("c_custkey"), col("rn"))
      .orderBy("rn")
      .collect()
      .toSeq
    assert(viaHelper.nonEmpty)
    assert(viaHelper == viaWindow)
  }

  test("window_ntile ≡ the unpartitioned ntile window form") {
    val viaQuery = SparkEntry
      .queries("window_ntile")(spark, sfDir)
      .collect()
      .toSeq
    val viaNtile = Tables
      .customer(spark, sfDir)
      .withColumn("quartile", ntile(4).over(Window.orderBy(order: _*)))
      .groupBy("quartile")
      .agg(
        count(lit(1)).as("n_customers"),
        sum((round(col("c_acctbal") * 100)).cast("long")).as("acctbal_cents"))
      .orderBy("quartile")
      .collect()
      .toSeq
    assert(viaQuery == viaNtile)
  }

  test("window_ntile: no unpartitioned window ever sees raw rows") {
    // The plan is ALLOWED two window shapes: the per-range-partition
    // row_number (partition spec nonempty → parallel) and the offset
    // prefix-sum, which is unpartitioned but must consume AGGREGATED
    // per-partition counts (O(#partitions) rows), never the table.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val plan = SparkEntry
      .queries("window_ntile")(spark, sfDir)
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected the two-pass window plan")
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(
        w.collectFirst { case a: Aggregate => a }.isDefined,
        s"unpartitioned window over raw rows (single-task funnel):\n$w")
    }
    // And the parallel local-row-number window must exist.
    assert(
      windows.exists(_.partitionSpec.nonEmpty),
      "expected a partitioned (parallel) local row-number window")
  }

  test("withRowNumber is lazy — construction runs no Spark jobs") {
    val sc = spark.sparkContext
    // Materialize the source frame first — parquet schema inference
    // runs its own job and is not what this test measures.
    val base = Tables
      .customer(spark, sfDir)
      .select(col("c_acctbal"), col("c_custkey"))
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    val built = GlobalRank.withRowNumber(base, order)
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after == before,
      "constructing the ranked frame must not trigger jobs")
    assert(built.columns.contains("rn"))
  }
}
