package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * array<float> columns — the codegen'd fast path for the similarity
  * hot loop (the `zip_with`+`aggregate` composition in
  * [[Vectors.cosine]] evaluates the lambda interpreter-side per
  * element; this emits a tight Java loop inside whole-stage codegen).
  *
  * Accumulation is left-to-right in double, term-for-term identical to
  * the HOF form AND to the DuckDB oracle's unnest+sum — the three
  * implementations are bit-equal, which the cosine_topk_native query's
  * shared oracle pins.
  *
  * Null semantics MIRROR the HOF form exactly: null input arrays
  * propagate null (BinaryExpression default); unequal-length arrays
  * and null elements also yield NULL (zip_with pads the shorter side
  * with nulls, which nulls the whole fold) — so the two forms are
  * interchangeable even outside the clean-embedding assumption.
  *
  * ZERO-NORM inputs follow the session's divide semantics, exactly
  * like the HOF form's Divide: under ANSI (the Spark 4 default) a
  * zero denominator throws DIVIDE_BY_ZERO; with ANSI off Spark's
  * legacy Divide yields NULL (not IEEE NaN — see the eval comment
  * below and CosinePropsSpec). Without this the optimizer rewrite
  * would silently turn an ANSI error into a legacy NULL — found by
  * CosinePropsSpec's degenerate random vectors.
  */
case class CosineSimExpr(
    left: Expression,
    right: Expression,
    failOnError: Boolean =
      org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
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

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) {
      // Mirror Spark's Divide exactly: ANSI throws, legacy is NULL
      // (Spark's non-ANSI divide yields NULL on a zero divisor even
      // for doubles — never IEEE NaN).
      if (failOnError) throw CosineSimExpr.divideByZero() else null
    } else dot / denom
  }

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = $a.numElements();
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y;
         |    $na += $x * $x;
         |    $nb += $y * $y;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  double $denom =
         |    java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($denom == 0.0) {
         |    ${if (failOnError)
               "throw graft.functions.CosineSimExpr.divideByZero();"
             else s"${ev.isNull} = true;"}
         |  } else {
         |    ${ev.value} = $dot / $denom;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {

  /** The error Spark's ANSI Divide raises on a zero divisor, same
    * exception supertype (ArithmeticException) and message text.
    * Spark's own SparkArithmeticException and QueryExecutionErrors
    * are private[spark]/private[sql], so an extension expression
    * cannot raise the exact class — callers matching on
    * ArithmeticException or on the DIVIDE_BY_ZERO text behave
    * identically. Called from both the interpreted eval and the
    * generated code.
    */
  def divideByZero(): ArithmeticException =
    new ArithmeticException(
      "[DIVIDE_BY_ZERO] Division by zero. Use `try_divide` to " +
        "tolerate divisor being 0 and return NULL instead. If " +
        "necessary set \"spark.sql.ansi.enabled\" to \"false\" to " +
        "bypass this error. SQLSTATE: 22012")

  /** Idempotently register `cosine_sim(a, b)` in the session's function
    * registry so it is callable from SQL / expr(). (Also injectable at
    * session build time via [[graft.GraftExtensions]].)
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      (args: Seq[Expression]) => CosineSimExpr(args(0), args(1)),
      "built-in")
}
