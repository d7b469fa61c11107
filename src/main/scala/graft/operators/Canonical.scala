package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The query-layer normalization operators (Q1–Q9 in SURVEY.md §2a),
  * re-expressed as composable, codegen-friendly Column/DataFrame
  * transforms. No UDFs: everything is built-in expression composition so
  * Catalyst sees through it (pushdown, CollapseProject, constant folding).
  */
object Canonical {

  /** Q1 (top_movies.py:131): safe numeric cast with →0 default.
    * Invalid or missing ranks become 0 — the reference's wart, preserved:
    * rank 0 sorts FIRST under ascending aggregates. `try_cast` keeps the
    * expression ANSI-safe (Spark 4 has ANSI mode on by default).
    */
  def safeRank(c: Column): Column = coalesce(c.try_cast("int"), lit(0))

  /** Q3+Q4+Q5 fused (top_movies.py:133-135): strip non-alphanumerics,
    * collapse whitespace runs, lowercase — one codegen'd expression
    * instead of the reference's three full-column passes.
    */
  def canonicalizeTitle(c: Column): Column =
    lower(regexp_replace(regexp_replace(c, "[^a-zA-Z0-9 ]", ""), "\\s{2,}", " "))

  /** Q6 (top_movies.py:137), wart-faithful: keep all rows of groups with
    * exactly `n` ROWS — row count, not distinct-source count, so a title
    * listed twice by one source and once by another still passes (pinned
    * by the fixtures' "Double Feature"). Window form: one shuffle on the
    * group key, shared with the downstream aggregate's partitioning.
    */
  def fullCoverage(df: DataFrame, n: Int, key: String): DataFrame =
    df.withColumn("__n", count(lit(1)).over(Window.partitionBy(key)))
      .filter(col("__n") === n)
      .drop("__n")

  /** Improved-mode coverage: distinct-source count (SURVEY.md §7.4) —
    * what the reference *meant*: titles present in all `n` sources.
    */
  def fullCoverageDistinct(df: DataFrame, n: Int, key: String,
                           src: String): DataFrame =
    df.withColumn(
        "__n", size(collect_set(col(src)).over(Window.partitionBy(key))))
      .filter(col("__n") === n)
      .drop("__n")

  /** S5/S8 generalized (README.md:9's own wish): table-driven value
    * repair as a broadcast left join + coalesce. The alias table is tiny
    * by construction, so this is a broadcast hash join — no shuffle of
    * the fact side at any scale.
    */
  def applyAliases(df: DataFrame, colName: String,
                   aliases: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val a = aliases.toDF("__alias_from", "__alias_to")
    df.join(broadcast(a), df(colName) === a("__alias_from"), "left")
      .withColumn(colName, coalesce(a("__alias_to"), df(colName)))
      .drop("__alias_from", "__alias_to")
  }

  /** Q7–Q9: grouped sum+mean in ONE aggregation pass (the reference
    * re-hashes the same grouping three times — SURVEY.md §4.2), then
    * ascending top-K with a deterministic tiebreak. `orderBy().limit()`
    * plans as TakeOrderedAndProject: per-partition heap top-K, no full
    * sort.
    */
  def rankReports(df: DataFrame, key: String, rankCol: String): DataFrame =
    df.groupBy(key)
      .agg(sum(rankCol).as("rank_sum"), avg(rankCol).as("rank_avg"))
}
