package graft

import org.apache.spark.sql.functions._

/** Driver-side sketch builders on DataFrameStatFunctions — the approx
  * membership/frequency surfaces beside the approx aggregates already
  * in the gate. Sketches have estimator-dependent internals no
  * cross-engine hash can pin, so these are property specs: the
  * guarantees each sketch SELLS (no false negatives; overestimate
  * only; error bound) must hold against exact counts.
  */
class SketchSpec extends SparkTestBase {

  test("bloomFilter: zero false negatives, FPP within bound") {
    val keys = Tables.customer(spark, sfDir).select(col("c_custkey"))
    val n = keys.count()
    val bf = keys.stat.bloomFilter("c_custkey", n, 0.03)
    // Every inserted key answers true — a bloom filter may lie
    // positive, never negative.
    val present = keys.collect().map(_.getLong(0))
    assert(present.forall(bf.mightContain))
    // False-positive rate over definitely-absent keys stays near the
    // configured 3% (loose 3× margin — it's a probabilistic bound).
    val absent = (1000000L until 1002000L)
    val fp = absent.count(bf.mightContain).toDouble / absent.size
    assert(fp <= 0.09, s"false-positive rate $fp far above configured 0.03")
  }

  test("countMinSketch: estimates never undercount, error within bound") {
    val seg = Tables.customer(spark, sfDir).select(col("c_mktsegment"))
    val n = seg.count()
    // (colName, eps, CONFIDENCE, seed): eps bounds the overestimate at
    // eps·n with the given confidence — 0.99 so the bound is the
    // with-high-probability contract, not a depth-1 sketch.
    val cms = seg.stat.countMinSketch("c_mktsegment", 0.001, 0.99, 42)
    val exact = seg
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, trueCount) =>
      val est = cms.estimateCount(k)
      assert(est >= trueCount, s"CMS undercounted $k: $est < $trueCount")
      // eps·n with a 3× margin, floored at one whole count — at small
      // fixture n the raw bound drops below 1, which would demand
      // exactness from a probabilistic structure.
      assert(est - trueCount <= math.max(1.0, 3 * 0.001 * n),
        s"CMS error for $k: est=$est true=$trueCount n=$n")
    }
  }
}
