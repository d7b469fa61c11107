package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression for the order-8 Hilbert curve index
  * over two integer coordinates in [0, 256) — the codegen'd form of
  * the per-bit-plane quadrant walk `OpsQueries.withHilbert` builds as
  * a projection chain. The chain exists because a single nested
  * Column expression grows ~3× per bit plane (the rotation references
  * each coordinate three times); this expression is the right
  * engine-level answer — ONE tight Java loop inside whole-stage
  * codegen, O(1) expression-tree size, no projection layers at all.
  * `hilbert_layout`/`curve_locality` run on this expression; the
  * projection chain remains as the pure-DataFrame reference
  * formulation (and the shape the oracle mirrors CTE-by-CTE), with
  * HilbertLayoutSpec proving the two forms bit-identical on the full
  * 256×256 grid.
  *
  * Algorithm (Hilbert curve via quadrant reflection, the classic
  * iterative form): for each bit plane s = 128…1, the quadrant digit
  * is (3·rx) XOR ry; when ry = 0 the sub-square is reflected
  * (if rx = 1) and transposed. Out-of-range coordinates are not an
  * error — the walk simply ignores bits above the 8th, matching the
  * chain's behavior.
  */
case class HilbertIndexExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two int arguments, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    var x = l.asInstanceOf[Int]
    var y = r.asInstanceOf[Int]
    var d = 0L
    var s = 128
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        val nx = if (rx == 1) s - 1 - y else y
        val ny = if (rx == 1) s - 1 - x else x
        x = nx
        y = ny
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xIn, yIn) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("ht")
      val d = ctx.freshName("hd")
      s"""
         |int $x = $xIn;
         |int $y = $yIn;
         |long $d = 0L;
         |for (int $s = 128; $s > 0; $s >>= 1) {
         |  int $rx = (($x & $s) > 0) ? 1 : 0;
         |  int $ry = (($y & $s) > 0) ? 1 : 0;
         |  $d += (long) $s * $s * ((3 * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) {
         |      int $t = $s - 1 - $y;
         |      $y = $s - 1 - $x;
         |      $x = $t;
         |    } else {
         |      int $t = $y;
         |      $y = $x;
         |      $x = $t;
         |    }
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndexExpr {

  /** Idempotently register `hilbert_index(x, y)` in the session's
    * function registry (also injectable via [[graft.GraftExtensions]]).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_index",
      (args: Seq[Expression]) => HilbertIndexExpr(args(0), args(1)),
      "built-in")
}
