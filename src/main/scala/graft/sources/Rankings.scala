package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Ingest wiring (S2/S10 in SURVEY.md §2a): pages → one partition per
  * page → typed `flatMap` extraction → single `raw_rankings` DataFrame.
  *
  * The reference fans out with one asyncio task per URL and appends each
  * batch to a global pandas frame (top_movies.py:108-125). Here the
  * fan-out is Spark task parallelism — one partition per page, so at
  * scale N pages parse on N cores/executors with no coordination — and
  * the accumulation is a lazy union inside one lineage instead of
  * mutation. Positional semantics (Ranker's rank↔name zip) stay inside a
  * single flatMap invocation, never across rows or partitions.
  */
object Rankings {

  /** Fixture pages as a Dataset with one partition per page — the same
    * shape a DataSourceV2 `webpage` scan with one InputPartition per URL
    * would produce (SURVEY.md §7.2 item 2).
    */
  def pages(spark: SparkSession): Dataset[Page] = {
    import spark.implicits._
    val ps = PageParsers.fixturePages()
    spark.createDataset(spark.sparkContext.parallelize(ps, ps.size))
  }

  /** The `raw_rankings` table: schema (url STRING, rank STRING,
    * title STRING). Unknown hosts extract zero rows (permissive,
    * S3-equivalent); union-all is implicit in the single flatMap over
    * the page partitions (S10).
    */
  def rawRankings(spark: SparkSession): DataFrame = {
    import spark.implicits._
    pages(spark).flatMap(PageParsers.parse _).toDF()
  }
}
