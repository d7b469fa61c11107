package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: each module under graft.operators contributes a map
  * of named queries `(SparkSession, sfDir) => DataFrame` plus matching
  * ANSI oracle SQL runnable by DuckDB over the same parquet tables
  * (fixture-ingest queries carry their expected extraction as an inline
  * VALUES relation instead). Every query emits a deterministic total
  * order (explicit tiebreak columns) so the driver's hash compare is
  * stable.
  */
object SparkEntry {

  /** Flagship query (the reference's whole pipeline, SURVEY.md §3.2) —
    * ingests the recorded fixture pages, canonicalizes, coverage-filters
    * and reports; driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    FlagshipQueries.flagship(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    FlagshipQueries.queries ++
      RelationalQueries.queries ++
      FunctionQueries.queries ++
      TextQueries.queries ++
      UnigramQueries.queries ++
      SimilarityQueries.queries ++
      SketchQueries.queries ++
      PcaQueries.queries ++
      FeatureQueries.queries ++
      AnnIndexQueries.queries ++
      MultimodalQueries.queries ++
      SourceQueries.queries ++
      MiscQueries.queries ++
      SqlSurfaceQueries.queries ++
      AnalyticsQueries.queries ++
      TpchQueries.queries ++
      OpsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    FlagshipQueries.oracleSql ++
      RelationalQueries.oracleSql ++
      FunctionQueries.oracleSql ++
      TextQueries.oracleSql ++
      UnigramQueries.oracleSql ++
      SimilarityQueries.oracleSql ++
      SketchQueries.oracleSql ++
      PcaQueries.oracleSql ++
      FeatureQueries.oracleSql ++
      AnnIndexQueries.oracleSql ++
      MultimodalQueries.oracleSql ++
      SourceQueries.oracleSql ++
      MiscQueries.oracleSql ++
      SqlSurfaceQueries.oracleSql ++
      AnalyticsQueries.oracleSql ++
      TpchQueries.oracleSql ++
      OpsQueries.oracleSql
}
