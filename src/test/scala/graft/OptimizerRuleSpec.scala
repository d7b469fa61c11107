package graft

import org.apache.spark.sql.catalyst.expressions.Lower
import org.apache.spark.sql.functions._

/** The injected optimizer rule must collapse nested idempotent string
  * ops in the optimized plan without changing results.
  */
class OptimizerRuleSpec extends SparkTestBase {
  import spark.implicits._

  test("lower(lower(x)) optimizes to a single Lower, same result") {
    // A non-literal input — constant folding would otherwise evaluate
    // the whole expression before our rule is observable.
    val df = Tables.part(spark, sfDir)
      .select(lower(lower(col("p_name"))).as("l"))
    val lowers = df.queryExecution.optimizedPlan
      .expressions
      .flatMap(_.collect { case l: Lower => l })
    assert(lowers.size == 1, s"expected 1 Lower, got ${lowers.size}")
    val viaSingle = Tables.part(spark, sfDir)
      .select(lower(col("p_name")).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(df.collect().map(_.getString(0)).toSeq == viaSingle)
  }

  test("trim(trim(x)) collapses too") {
    val df = Tables.part(spark, sfDir)
      .select(trim(trim(col("p_name"))).as("t"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert("trim\\(".r.findAllIn(plan.toLowerCase).size <= 1, plan)
    assert(df.count() == 200)
  }
}
