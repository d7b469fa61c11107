package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.L2SqExpr

/** Optimizer rule for the PQ family's hot loop: recognize the HOF
  * squared-L2 composition `SimilarityQueries.l2sq` builds —
  *
  *   aggregate(zip_with(a, b,
  *     (x,y) -> (double(x)-double(y)) * (double(x)-double(y))),
  *     0.0, +)
  *
  * — and swap in the native codegen [[L2SqExpr]]. The HOF lambda
  * evaluates interpreter-side per element and the PQ encode runs it
  * N×M×Codes times per scan; the native form is one fused Java loop
  * inside whole-stage codegen. The rewrite is safe because the two
  * forms are BIT-EQUAL including null semantics (`L2SqRewriteSpec`
  * pins equality; every rewritten PQ query still hash-matches its
  * DuckDB oracle, which is the continuous proof).
  *
  * Pattern-matching is strict: the multiply's two factors must BOTH
  * be `double(x) − double(y)` over the two zip variables in the same
  * order, the fold must start at literal 0.0 with an add merge and
  * identity finish, and both inputs must be float arrays — so the
  * dot-product shape (RewriteHofCosine's target) and any rescaled
  * variant are left untouched.
  */
object RewriteHofL2Sq extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
            ZipWith(
              a,
              b,
              LambdaFunction(
                Multiply(
                  Subtract(
                    Cast(x1: NamedLambdaVariable, DoubleType, _, _),
                    Cast(y1: NamedLambdaVariable, DoubleType, _, _),
                    _),
                  Subtract(
                    Cast(x2: NamedLambdaVariable, DoubleType, _, _),
                    Cast(y2: NamedLambdaVariable, DoubleType, _, _),
                    _),
                  _),
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
              _)) =>
        val sameVars =
          x1.exprId == x.exprId && x2.exprId == x.exprId &&
            y1.exprId == y.exprId && y2.exprId == y.exprId
        val identityFinish = fin.exprId == farg.exprId
        val addMerge =
          Set(ml.exprId, mr.exprId) == Set(acc.exprId, v.exprId)
        if (sameVars && identityFinish && addMerge &&
          isFloatArray(a) && isFloatArray(b))
          L2SqExpr(a, b)
        else agg
    }
}
