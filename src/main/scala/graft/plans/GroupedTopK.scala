package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Grouped top-K as a WHOLE custom operator — logical node + planner
  * strategy + physical exec, registered via `GraftExtensions`
  * (SURVEY.md §2b "custom operator" path (c)).
  *
  * Why it exists: Spark expresses per-key top-K as
  * `row_number().over(Window.partitionBy(k).orderBy(o)) <= K`, whose
  * physical plan SORTS EVERY PARTITION FULLY before the window
  * operator. At 100 TB that sort is the dominant cost, yet only K
  * rows per key survive. This operator keeps a bounded K-row heap per
  * key per partition instead: memory O(keys_in_partition × K) instead
  * of sort buffers over everything, no sort-spill, same shuffle
  * (cluster by key) — the plan shape you'd want at scale.
  *
  * Output = child columns + `rnk` (1-based, per key, in sort order).
  * Determinism: the ordering must be total per key (caller supplies
  * tiebreak columns, same rule as every oracle query).
  */
case class GroupedTopK(
    keys: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    // A constructor parameter, NOT a body val: optimizer transforms
    // rebuild this node via copy(), and a body val would mint a fresh
    // exprId each time, orphaning every upstream reference to rnk.
    rankAttr: Attribute =
      AttributeReference("rnk", IntegerType, nullable = false)())
    extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override lazy val resolved: Boolean =
    childrenResolved && keys.forall(_.resolved) &&
      order.forall(_.resolved)

  override protected def withNewChildInternal(
      newChild: LogicalPlan): GroupedTopK = copy(child = newChild)
}

case class GroupedTopKExec(
    keys: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  /** Cluster rows by key — the ONLY movement this operator needs; no
    * sort is requested from the child.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = GenerateUnsafeProjection.generate(keyExprs, childOutput)
      val ord: Ordering[InternalRow] =
        RowOrdering.create(sortOrder, childOutput)
      // Per-key bounded heap; head = WORST kept row (max under ord,
      // since ord sorts best-first).
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        // keyProj reuses one buffer; copy the key ONLY when inserting
        // a new group (the rare case — rows per key >> keys), not on
        // every row of the hot loop.
        val key = keyProj(row)
        var heap = heaps.getOrElse(key, null)
        if (heap == null) {
          heap =
            scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val outProj = GenerateUnsafeProjection.generate(
        childOutput.map(a => a: Expression) :+
          BoundReference(childOutput.length, IntegerType, nullable = false),
        childOutput :+ rankAttr)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, heap) =>
        // dequeueAll yields worst-first; reverse → rank 1 = best.
        val rows: scala.collection.immutable.Seq[InternalRow] =
          heap.dequeueAll
        rows.reverseIterator.zipWithIndex.map {
          case (row, i) =>
            rankRow.setInt(0, i + 1)
            outProj(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): GroupedTopKExec = copy(child = newChild)
}

/** Planner strategy mapping the logical node to its exec. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GroupedTopK =>
      GroupedTopKExec(g.keys, g.order, g.k, g.rankAttr,
        planLater(g.child)) :: Nil
    case _ => Nil
  }
}

object GroupedTopK {

  /** User-facing API: per-key top-K of `df` ordered by `orderCols`
    * ((name, descending)); appends a 1-based `rnk` column.
    */
  def topK(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(k > 0, s"topK requires k > 0, got $k")
    val spark = df.sparkSession
    // Idempotent runtime registration for sessions built without
    // spark.sql.extensions (same pattern as CosineSimExpr.register);
    // a duplicate of the injected strategy is harmless — first match
    // wins and both are the same object.
    if (!spark.experimental.extraStrategies.contains(GraftStrategies))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategies
    val analyzed = df.queryExecution.analyzed
    // Resolve through the session's resolver (case-insensitive under
    // the default spark.sql.caseSensitive=false, and ambiguity-aware),
    // matching how col()/select() bind names.
    val resolver = spark.sessionState.analyzer.resolver
    def attr(name: String): Attribute = analyzed
      .resolve(Seq(name), resolver)
      .map(_.toAttribute)
      .getOrElse(throw new IllegalArgumentException(
        s"no column $name in ${analyzed.output.map(_.name)}"))
    val order = orderCols.map { case (name, desc) =>
      val dir = if (desc) Descending else Ascending
      SortOrder(attr(name), dir, dir.defaultNullOrdering, Seq.empty)
    }
    GraftShims.ofRows(
      spark,
      GroupedTopK(keyCols.map(attr), order, k, analyzed))
  }
}
