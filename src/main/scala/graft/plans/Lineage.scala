package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._

/** COLUMN-LEVEL LINEAGE extraction — the data-governance question
  * ("which source columns feed this output?") answered from the
  * ANALYZED logical plan, the same tree Catalyst optimizes. Walks
  * bottom-up: leaf relations seed each attribute with its own
  * (qualified) name; Project/Aggregate/Window nodes map every
  * expression they DEFINE to the union of the source sets of the
  * attributes it references; all other nodes (joins, filters, sorts)
  * define nothing and just merge child maps. Typed/opaque nodes
  * (object serializers, mapPartitions) conservatively attribute every
  * output to every child source — which is the truthful answer for a
  * black-box function.
  *
  * This is plan METADATA, not data — the extraction runs on the
  * driver in microseconds regardless of table size, which is what
  * makes plan-derived lineage the scalable alternative to data
  * scanning for governance catalogs.
  */
object Lineage {

  private def qualify(a: AttributeReference): String =
    (a.qualifier.lastOption.toSeq :+ a.name).mkString(".")

  def trace(plan: LogicalPlan): Map[ExprId, Set[String]] = {
    val childMaps: Map[ExprId, Set[String]] =
      plan.children.map(trace).foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
    def sourcesOf(ne: NamedExpression): Set[String] =
      ne.references.toSeq.flatMap { r =>
        childMaps.getOrElse(r.exprId, Set(r.name))
      }.toSet
    plan match {
      case l: LeafNode =>
        l.output.map {
          case a: AttributeReference => a.exprId -> Set(a.name)
          case o => o.exprId -> Set(o.name)
        }.toMap
      case p: Project =>
        childMaps ++ p.projectList.map(ne => ne.exprId -> sourcesOf(ne))
      case a: Aggregate =>
        childMaps ++ a.aggregateExpressions.map(ne =>
          ne.exprId -> sourcesOf(ne))
      case w: Window =>
        childMaps ++ w.windowExpressions.map(ne =>
          ne.exprId -> sourcesOf(ne))
      case g: Generate =>
        childMaps ++ g.generatorOutput.map(a =>
          a.exprId -> g.generator.references.toSeq
            .flatMap(r => childMaps.getOrElse(r.exprId, Set(r.name)))
            .toSet)
      case e: Expand =>
        // Each output position unions the sources of that position
        // across every projection row (grouping sets semantics).
        childMaps ++ e.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> e.projections.flatMap { row =>
            row(i).references.toSeq.flatMap(r =>
              childMaps.getOrElse(r.exprId, Set(r.name)))
          }.toSet
        }
      case u: Union =>
        // A Union's output reuses the FIRST child's ExprIds, so the
        // merge-only fall-through would silently drop every source
        // feeding branches 2..n. Map each output position to the
        // union, across ALL children, of that position's source sets.
        childMaps ++ u.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> u.children.flatMap { c =>
            val ca = c.output(i)
            childMaps.getOrElse(ca.exprId, Set(ca.name))
          }.toSet
        }
      case so: SetOperation =>
        // Intersect/Except policy: although output VALUES come from
        // the left child, the right child's same-position column
        // determines membership row-by-row — for governance that is a
        // value-determining input, so both sides count as sources.
        childMaps ++ so.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> so.children.flatMap { c =>
            val ca = c.output(i)
            childMaps.getOrElse(ca.exprId, Set(ca.name))
          }.toSet
        }
      case o if o.isInstanceOf[SerializeFromObject] ||
          o.isInstanceOf[MapPartitions] ||
          o.isInstanceOf[DeserializeToObject] =>
        // Opaque typed boundary: every output may depend on anything
        // below it.
        val all = childMaps.values.flatten.toSet
        childMaps ++ o.output.map(a => a.exprId -> all)
      case o =>
        childMaps
    }
  }

  /** Lineage of a frame's OUTPUT columns as a small DataFrame:
    * (out_col, src_cols) with the source set comma-joined in sorted
    * order — the catalog-ingestable shape.
    */
  def report(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val plan = df.queryExecution.analyzed
    val m = trace(plan)
    plan.output
      .map(a =>
        (a.name,
          m.getOrElse(a.exprId, Set(a.name)).toSeq.sorted
            .mkString(",")))
      .toDF("out_col", "src_cols")
  }
}
