package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Lower, StringTrim}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Demonstrative optimizer rule (injected via
  * graft.GraftExtensions): collapse directly-nested idempotent string
  * operations — `lower(lower(x))` → `lower(x)`,
  * `trim(trim(x))` → `trim(x)`. Both rewrites are strictly
  * semantics-preserving (the functions are idempotent and null-
  * preserving), so the rule can run in any batch, any number of times
  * (it is a fixpoint).
  *
  * Composed pipelines build canonicalization expressions from shared
  * helpers, so nesting like this arises naturally when one layer's
  * output feeds another layer that defensively re-normalizes; at scale
  * each collapsed node saves a full pass over the column in codegen.
  */
object CollapseIdempotentStringOps extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Lower(inner @ Lower(_)) => inner
      case outer @ StringTrim(inner @ StringTrim(_, None), None) => inner
    }
}
