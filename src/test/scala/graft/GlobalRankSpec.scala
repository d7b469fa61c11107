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

  test("window_ntile plans without any WindowExec") {
    val plan = SparkEntry
      .queries("window_ntile")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(
      !plan.contains("Window"),
      s"expected the range-shuffle row-number plan, not a window:\n$plan")
  }
}
