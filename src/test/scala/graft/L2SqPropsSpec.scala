package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized bit-exactness for the native squared-L2 expression on
  * degenerate floats (overflow to Infinity, denormals, mixed signs,
  * zeros): `RewriteHofL2Sq` silently substitutes the native loop for
  * the HOF fold, so the two must agree bit-for-bit on EVERY input —
  * including where (x−y)² overflows double or collapses to 0.0 vs
  * −0.0. No division in this kernel, so unlike cosine there is no
  * ANSI edge; pure IEEE accumulation parity. Fixed seeds,
  * CanonicalPropsSpec pattern.
  */
class L2SqPropsSpec extends SparkTestBase {

  private def hofL2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0),
      (acc, v) => acc + v)

  private val elemGen: Gen[Float] = Gen.frequency(
    4 -> Gen.chooseNum(-5.0f, 5.0f),
    2 -> Gen.const(0.0f),
    1 -> Gen.const(-0.0f),
    1 -> Gen.const(1e-30f),
    1 -> Gen.const(-1e30f),
    1 -> Gen.const(3e38f),
    1 -> Gen.const(Float.MinPositiveValue))

  private def pairGen: Gen[(Seq[Float], Seq[Float])] =
    for {
      dim <- Gen.chooseNum(1, 8)
      a <- Gen.listOfN(dim, elemGen)
      b <- Gen.listOfN(dim, elemGen)
    } yield (a, b)

  test("native l2_sq ≡ HOF fold bit-for-bit on degenerate vectors") {
    import spark.implicits._
    graft.functions.L2SqExpr.register(spark)
    val params = Gen.Parameters.default
    val pairs = (0 until 300).flatMap(i =>
      pairGen.apply(params, Seed(60606L + i)).toSeq)
    assert(pairs.size >= 250)
    val rows = pairs
      .toDF("va", "vb")
      .select(
        col("va"), col("vb"),
        hofL2Sq(col("va"), col("vb")).as("hof"),
        expr("l2_sq(va, vb)").as("native"))
      .collect()
    rows.foreach { r =>
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(3)),
        s"divergence on va=${r.getSeq[Float](0)} vb=${r.getSeq[Float](1)}: " +
          s"hof=${r.getDouble(2)} native=${r.getDouble(3)}")
    }
  }
}
