package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import graft.sources.PageParsers

/** The V2 scan's reported statistics must reflect the post-prune
  * partition list and must actually STEER the planner: a join against
  * the source picks a hint-free broadcast of the source side because
  * the stats say it is KB-scale — the same stats→plan path ANALYZE'd
  * catalog tables use, working for a fetch connector.
  */
class WebpageStatsSpec extends SparkTestBase {

  private def pages = spark.read
    .format("graft.sources.WebpageDataSource")
    .load()

  private def scanStats(df: DataFrame) = {
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }
    assert(scans.size == 1, s"expected one v2 scan, got ${scans.size}")
    scans.head
      .asInstanceOf[
        org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
  }

  test("reported stats reflect the post-prune partition list") {
    assert(scanStats(pages).numRows().getAsLong == 3)
    val pruned =
      scanStats(pages.where(col("url") === PageParsers.ImdbUrl))
    assert(pruned.numRows().getAsLong == 1,
      "pushed url filter must shrink the reported row count")
    assert(pruned.sizeInBytes().getAsLong < 16 * 1024)
  }

  test("stats drive a hint-free broadcast of the source side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(
      "spark.sql.autoBroadcastJoinThreshold", (16 * 1024).toString)
    try {
      val big = spark
        .range(200000)
        .select(concat(lit("u"), col("id")).as("u"))
      val joined = pages.join(big, col("url") === col("u"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"expected a stats-driven broadcast join:\n$plan")
      // pages is the LEFT side as written; the planner must build on
      // it (the side the stats call tiny), not on the 200k range.
      assert(plan.contains("BuildLeft"),
        s"broadcast must build on the source side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
