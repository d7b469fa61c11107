package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSimExpr

/** SparkSessionExtensions entry point: inject the engine's native
  * functions at session build time
  * (`spark.sql.extensions=graft.GraftExtensions`). Runtime
  * registration via [[CosineSimExpr.register]] is equivalent for
  * sessions built without the conf.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ =>
      graft.plans.CollapseIdempotentStringOps)
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofCosine)
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
    ext.injectFunction(
      (
        new FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(
          classOf[CosineSimExpr].getName,
          "cosine_sim"),
        (args: Seq[Expression]) => CosineSimExpr(args(0), args(1))))
    ext.injectFunction(
      (
        new FunctionIdentifier("parse_movies"),
        new ExpressionInfo(
          classOf[graft.functions.ParseMoviesGenerator].getName,
          "parse_movies"),
        (args: Seq[Expression]) =>
          graft.functions.ParseMoviesGenerator(args(0), args(1))))
  }
}
