package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{CosineSimExpr, Vectors}

/** Randomized bit-exactness for the native cosine expression in UGLY
  * float territory: zero-norm vectors (0/0), denormal-tiny and
  * float-overflow magnitudes, mixed signs, dims 1–8. The optimizer
  * rule (`RewriteHofCosine`) SILENTLY substitutes the native
  * expression for the HOF composition, so any divergence here is a
  * query-result change, not a style difference — the two must agree
  * bit-for-bit (NaN bit patterns included) on every input, not just
  * on well-behaved embeddings. Fixed seeds, CanonicalPropsSpec
  * pattern.
  */
class CosinePropsSpec extends SparkTestBase {

  private val elemGen: Gen[Float] = Gen.frequency(
    4 -> Gen.chooseNum(-5.0f, 5.0f),
    2 -> Gen.const(0.0f),
    1 -> Gen.const(1e-30f),
    1 -> Gen.const(-1e30f),
    1 -> Gen.const(3e38f), // near Float.MaxValue: dot overflows
    1 -> Gen.const(Float.MinPositiveValue))

  private def pairGen: Gen[(Seq[Float], Seq[Float])] =
    for {
      dim <- Gen.chooseNum(1, 8)
      a <- Gen.listOfN(dim, elemGen)
      b <- Gen.listOfN(dim, elemGen)
    } yield (a, b)

  private def nonZeroNorm(v: Seq[Float]) = v.exists(_ != 0.0f)

  test("native ≡ HOF bit-for-bit on degenerate random vectors") {
    import spark.implicits._
    CosineSimExpr.register(spark)
    val params = Gen.Parameters.default
    val pairs = (0 until 300)
      .flatMap(i => pairGen.apply(params, Seed(31337L + i)).toSeq)
      .filter(p => nonZeroNorm(p._1) && nonZeroNorm(p._2))
    assert(pairs.size >= 200)
    val rows = pairs
      .toDF("va", "vb")
      .select(
        col("va"), col("vb"),
        Vectors.cosine(col("va"), col("vb")).as("hof"),
        expr("cosine_sim(va, vb)").as("native"))
      .collect()
    rows.foreach { r =>
      val hofBits =
        if (r.isNullAt(2)) -1L
        else java.lang.Double.doubleToLongBits(r.getDouble(2))
      val natBits =
        if (r.isNullAt(3)) -1L
        else java.lang.Double.doubleToLongBits(r.getDouble(3))
      assert(hofBits == natBits,
        s"divergence on va=${r.getSeq[Float](0)} vb=${r.getSeq[Float](1)}: " +
          s"hof=${if (r.isNullAt(2)) "null" else r.getDouble(2).toString} " +
          s"native=${if (r.isNullAt(3)) "null" else r.getDouble(3).toString}")
    }
  }

  test("zero-norm vectors follow the session's divide semantics, both forms") {
    import spark.implicits._
    CosineSimExpr.register(spark)
    val df = Seq((Seq(0f, 0f), Seq(1f, 2f))).toDF("va", "vb")

    // ANSI on (the Spark 4 default): BOTH forms throw DIVIDE_BY_ZERO —
    // the rewrite must not turn an error into a NaN.
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    Seq(
      "hof" -> df.select(Vectors.cosine(col("va"), col("vb"))),
      "native" -> df.select(expr("cosine_sim(va, vb)"))
    ).foreach { case (label, q) =>
      val e = intercept[Exception](q.collect())
      assert(e.getMessage.contains("DIVIDE_BY_ZERO"),
        s"$label: expected DIVIDE_BY_ZERO, got ${e.getMessage.take(120)}")
    }

    // ANSI off: Spark's legacy divide yields NULL on a zero divisor
    // (never IEEE NaN) — both forms must agree on that too.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val r = df.select(
        Vectors.cosine(col("va"), col("vb")).as("hof"),
        expr("cosine_sim(va, vb)").as("native"))
        .collect().head
      assert(r.isNullAt(0) && r.isNullAt(1), r.toString)
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }
}
