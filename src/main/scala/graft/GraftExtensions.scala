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
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofL2Sq)
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
        new FunctionIdentifier("l2_sq"),
        new ExpressionInfo(
          classOf[graft.functions.L2SqExpr].getName,
          "l2_sq"),
        (args: Seq[Expression]) =>
          graft.functions.L2SqExpr(args(0), args(1))))
    ext.injectFunction(
      (
        new FunctionIdentifier("hilbert_index"),
        new ExpressionInfo(
          classOf[graft.functions.HilbertIndexExpr].getName,
          "hilbert_index"),
        (args: Seq[Expression]) =>
          graft.functions.HilbertIndexExpr(args(0), args(1))))
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
