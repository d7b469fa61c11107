package graft

import org.apache.spark.sql.functions._
import graft.functions.{CosineSimExpr, Vectors}

/** The native codegen expression must be bit-identical to the HOF
  * composition on real embedding data (both are left-to-right double
  * folds), and callable from SQL after registration.
  */
class CosineSimExprSpec extends SparkTestBase {

  test("native cosine_sim ≡ HOF cosine, bit-exact, on real embeddings") {
    CosineSimExpr.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .filter(col("ia") < 20)
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
      .filter(col("ib") < 20)
    val both = a
      .crossJoin(b)
      .select(
        Vectors.cosine(col("va"), col("vb")).as("hof"),
        expr("cosine_sim(va, vb)").as("native"))
      .collect()
    assert(both.length == 400)
    both.foreach { r =>
      // bitwise equality, not tolerance — same fold order by design
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null semantics mirror the HOF form outside the clean case") {
    CosineSimExpr.register(spark)
    import spark.implicits._
    // (unequal lengths, null element, null array) — zip_with pads the
    // shorter side with null / propagates element nulls, which nulls
    // the whole fold; the native expression must agree row-for-row.
    val df = Seq(
      (Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](1f, 2f, 3f)),
      (Seq[java.lang.Float](1f, null), Seq[java.lang.Float](1f, 2f)),
      (null, Seq[java.lang.Float](1f, 2f))
    ).toDF("va", "vb")
    val rows = df
      .select(
        Vectors.cosine(col("va"), col("vb")).as("hof"),
        expr("cosine_sim(va, vb)").as("native"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0), s"HOF expected null: $r")
      assert(r.isNullAt(1), s"native expected null: $r")
    }
  }

  test("cosine_sim is SQL-callable and type-checks its arguments") {
    CosineSimExpr.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_v")
    val one = spark
      .sql("SELECT cosine_sim(embedding, embedding) AS s FROM emb_v LIMIT 5")
      .collect()
    one.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim(1, 2)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }
}
