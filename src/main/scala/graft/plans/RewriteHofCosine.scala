package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.CosineSimExpr

/** Optimizer rule doing REAL work: recognize the HOF cosine
  * composition that [[graft.functions.Vectors.cosine]] builds —
  *
  *   aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0, +)
  *     / (sqrt(dot(a,a)) * sqrt(dot(b,b)))
  *
  * — and swap in the native codegen [[CosineSimExpr]]. The HOF form
  * evaluates its lambda interpreter-side per element; the native
  * expression is a tight fused Java loop inside whole-stage codegen
  * (one array traversal instead of four). The rewrite is safe because
  * the two forms are BIT-EQUAL, including null semantics (null array /
  * unequal lengths / null element → NULL) — both pinned by
  * `CosineSimExprSpec`, and every rewritten query still hash-matches
  * its DuckDB oracle, which is the continuous proof.
  *
  * Pattern-matching is strict (exact zero literal, multiply-of-casts
  * lambda, identity finish, float arrays, both norms over the same
  * child as the dot) so anything else — e.g. the LSH plane projection,
  * which shares the zip_with shape — is left untouched.
  */
object RewriteHofCosine extends Rule[LogicalPlan] {

  /** Recognize `aggregate(zip_with(a, b, (x,y) -> dx*dy), 0.0, +)` and
    * return (a, b). The lambda bodies are bound-checked against their
    * own arguments — the multiply must be double-casts of the TWO zip
    * variables (in either order) and the merge must add its two
    * arguments — so a sum-of-squares or a rescaled merge can never be
    * mistaken for a dot product.
    */
  private def asDot(e: Expression): Option[(Expression, Expression)] = {
    def varId(c: Expression): Option[Long] = c match {
      case Cast(v: NamedLambdaVariable, DoubleType, _, _) =>
        Some(v.exprId.id)
      case _ => None
    }
    e match {
      case ArrayAggregate(
            ZipWith(
              a,
              b,
              LambdaFunction(
                Multiply(cx, cy, _),
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable),
                _)),
            Literal(0.0, DoubleType),
            LambdaFunction(
              Add(ml: NamedLambdaVariable, mr: NamedLambdaVariable, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable),
              _),
            LambdaFunction(
              fin: NamedLambdaVariable,
              Seq(farg: NamedLambdaVariable),
              _))
          if fin.exprId == farg.exprId &&
            Set(ml.exprId, mr.exprId) == Set(acc.exprId, v.exprId) &&
            ((varId(cx), varId(cy)) match {
              case (Some(i), Some(j)) =>
                Set(i, j) == Set(x.exprId.id, y.exprId.id)
              case _ => false
            }) =>
        Some((a, b))
      case _ => None
    }
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // The divide's eval mode flows into the native expression so
      // the rewrite preserves divide-by-zero behavior exactly: ANSI
      // throws, LEGACY is NULL (Spark's legacy Divide semantics — not
      // IEEE NaN). TRY (try_divide) is left unrewritten — the
      // null-on-zero contract has no native twin here and the HOF
      // interpreter path is already correct for it. NOTE: Divide's
      // third field is a NumericEvalContext WRAPPER, not the EvalMode
      // value — comparing the wrapper against EvalMode members
      // typechecks (Any equality) but is always false, which would
      // silently pin failOnError=false and downgrade an ANSI error to
      // NULL; RewriteHofCosineSpec pins the unwrapped path on a
      // non-local plan where the rule actually fires.
      case d @ Divide(num, Multiply(Sqrt(na), Sqrt(nb), _), ctx)
          if ctx.evalMode != EvalMode.TRY =>
        (asDot(num), asDot(na), asDot(nb)) match {
          case (Some((a, b)), Some((a1, a2)), Some((b1, b2)))
              if a1.semanticEquals(a2) && a1.semanticEquals(a) &&
                b1.semanticEquals(b2) && b1.semanticEquals(b) &&
                isFloatArray(a) && isFloatArray(b) =>
            CosineSimExpr(a, b,
              failOnError = ctx.evalMode == EvalMode.ANSI)
          case _ => d
        }
    }
}
