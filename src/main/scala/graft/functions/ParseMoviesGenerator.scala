package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{Page, PageParsers}

/** SQL-callable extraction (SURVEY.md §7.2 item 3): a Catalyst
  * `Generator` exposing the per-site parsers as
  * `parse_movies(url, html)` → rows of (rank STRING, title STRING),
  * so the whole ingest is expressible in SQL:
  *
  * {{{
  * SELECT url, pm.rank, pm.title
  * FROM webpage LATERAL VIEW parse_movies(url, html) pm AS rank, title
  * }}}
  *
  * Exactly the typed-flatMap semantics (site dispatch by URL substring,
  * every parser wart preserved — reference top_movies.py:71-105), but as
  * a first-class relational operator: Catalyst plans it as a `Generate`
  * node, so column pruning and filter pushdown still apply to the
  * surrounding query, and each invocation is row-local (the Ranker
  * rank↔name zip never crosses rows). NULL url/html → zero rows, the
  * permissive S3 tolerance.
  */
case class ParseMoviesGenerator(url: Expression, html: Expression)
    extends Generator
    with CodegenFallback {

  override def children: Seq[Expression] = Seq(url, html)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"parse_movies requires (STRING, STRING), got " +
          children.map(_.dataType.simpleString).mkString(", "))

  override def elementSchema: StructType = StructType(Seq(
    StructField("rank", StringType),
    StructField("title", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val u = url.eval(input)
    val h = html.eval(input)
    if (u == null || h == null) Nil
    else
      PageParsers
        .parse(Page(u.toString, h.toString))
        .map(r =>
          InternalRow(
            UTF8String.fromString(r.rank),
            UTF8String.fromString(r.title)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ParseMoviesGenerator =
    copy(url = newChildren(0), html = newChildren(1))
}

object ParseMoviesGenerator {
  /** Runtime registration for sessions built without
    * `spark.sql.extensions=graft.GraftExtensions`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_movies",
      (args: Seq[Expression]) => ParseMoviesGenerator(args(0), args(1)),
      "built-in")
}
