package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The HOF→native squared-L2 rewrite must fire on the exact
  * composition `SimilarityQueries.l2sq` builds (the PQ family's hot
  * loop — N×M×Codes evaluations per encode scan), must NOT touch the
  * dot-product shape (RewriteHofCosine's target), and the rewritten
  * plan must agree with the interpreted HOF fold bit-for-bit,
  * including the null edges.
  */
class L2SqRewriteSpec extends SparkTestBase {

  /** The exact fold SimilarityQueries.l2sq builds. */
  private def hofL2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0),
      (acc, v) => acc + v)

  test("HOF squared-L2 is rewritten to the native expression") {
    val e = Tables.embeddings(spark, sfDir)
    val df = e
      .crossJoin(
        e.select(col("vec_id").as("id2"), col("embedding").as("e2")))
      .filter(col("vec_id") < 3 && col("id2") < 3)
      .select(col("vec_id"), col("id2"),
        hofL2Sq(col("embedding"), col("e2")).as("d2"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("l2_sq"),
      s"expected L2SqExpr in optimized plan:\n$optimized")
    // Self-distance is exactly zero; the rewritten values must equal
    // the interpreted fold bit-for-bit.
    val rows = df.collect()
    assert(rows.filter(r => r.getLong(0) == r.getLong(1))
      .forall(_.getDouble(2) == 0.0))
    val viaExpr = e
      .crossJoin(
        e.select(col("vec_id").as("id2"), col("embedding").as("e2")))
      .filter(col("vec_id") < 3 && col("id2") < 3)
      .select(col("vec_id"), col("id2"),
        expr("l2_sq(embedding, e2)").as("d2"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    rows.foreach { r =>
      assert(viaExpr((r.getLong(0), r.getLong(1))) == r.getDouble(2),
        "rewritten HOF and direct l2_sq diverged")
    }
  }

  test("dot-product lambda is not mistaken for squared L2") {
    val e = Tables.embeddings(spark, sfDir)
    val df = e
      .crossJoin(
        e.select(col("vec_id").as("id2"), col("embedding").as("e2")))
      .filter(col("vec_id") < 2 && col("id2") < 2)
      .select(
        aggregate(
          zip_with(col("embedding"), col("e2"),
            (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0),
          (acc, v) => acc + v).as("dot"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("l2_sq"),
      s"dot-product fold must not rewrite to l2_sq:\n$optimized")
  }

  test("null edges match the HOF fold") {
    import spark.implicits._
    val data = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 3.0f)), // plain
      (Array(1.0f), Array(1.0f, 2.0f)), // unequal length
      (null, Array(1.0f)) // null side
    ).toDF("a", "b")
    val got = data
      .select(
        hofL2Sq(col("a"), col("b")).as("hof"),
        expr("l2_sq(a, b)").as("native"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null semantics diverged: $r")
      if (!r.isNullAt(0))
        assert(r.getDouble(0) == r.getDouble(1), s"values diverged: $r")
    }
    assert(got.count(_.isNullAt(1)) == 2)
  }
}
