package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for squared L2 distance over two
  * array<float> columns — the codegen'd fast path for the PQ family's
  * hot loop (`SimilarityQueries.l2sq` builds the
  * `aggregate(zip_with(...))` HOF form, whose lambda evaluates
  * interpreter-side per element; this emits one tight Java loop inside
  * whole-stage codegen). The PQ encode evaluates it N×M×Codes times
  * per scan, which is why it earns a native form like cosine did.
  *
  * Accumulation is left-to-right in double with the per-element
  * `(x−y)·(x−y)` computed in the identical IEEE op order as the HOF
  * fold AND the DuckDB oracle's unnest+sum — the three
  * implementations are bit-equal, continuously proven by the
  * pq_topk/pq_topk_rerank/ivfpq_topk oracles running against the
  * rewritten plans.
  *
  * Null semantics mirror the HOF form exactly: null input arrays
  * propagate null; unequal lengths and null elements also yield NULL
  * (zip_with pads the shorter side with nulls, nulling the fold).
  */
case class L2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "l2_sq"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    double $d = (double) $a.getFloat($i)
         |      - (double) $b.getFloat($i);
         |    $acc += $d * $d;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object L2SqExpr {

  /** Idempotently register `l2_sq(a, b)` in the session's function
    * registry (also injectable via [[graft.GraftExtensions]]).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_sq",
      (args: Seq[Expression]) => L2SqExpr(args(0), args(1)),
      "built-in")
}
