package graft

import org.apache.spark.sql.functions._
import graft.functions.BottomKAggregator

import scala.util.Random

/** KMV bottom-k sketch: exactness of the sketch itself (it is a pure
  * function of the distinct-value set), merge-order/partitioning
  * invariance, and the cardinality-estimator error bound the
  * `kmv_distinct` / `kmv_union_intersect` queries sell.
  */
class BottomKSpec extends SparkTestBase {

  private val K = 64

  test("reduce/merge yield exactly the k smallest distinct values") {
    val rnd = new Random(42)
    for (trial <- 0 until 20) {
      val n = 1 + rnd.nextInt(400)
      // Duplicates on purpose: KMV is a distinct sketch.
      val vs = Seq.fill(n)(rnd.nextLong(1L << 60))
      val dup = rnd.shuffle(vs ++ vs.take(n / 2))
      val agg = new BottomKAggregator(K)
      val expected = vs.distinct.sorted.take(K).toArray

      // Pure reduce chain.
      val reduced = dup.foldLeft(agg.zero)(agg.reduce)
      assert(reduced.sameElements(expected), s"trial $trial reduce")

      // Arbitrary split points, merged in both orders.
      val cut = rnd.nextInt(dup.size + 1)
      val (l, r) = dup.splitAt(cut)
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(bl.clone(), br.clone()).sameElements(expected))
      assert(agg.merge(br.clone(), bl.clone()).sameElements(expected))
    }
  }

  test("sketch is partitioning-invariant through a Spark aggregation") {
    import spark.implicits._
    val rnd = new Random(7)
    val vs = Seq.fill(5000)(rnd.nextLong(1L << 60))
    val bottomK = udaf(new BottomKAggregator(K))
    def sketchWith(parts: Int): Seq[Long] =
      vs.toDF("h").repartition(parts)
        .agg(bottomK(col("h")).as("sk"))
        .collect()(0).getSeq[Long](0)
    val one = sketchWith(1)
    assert(one == sketchWith(3) && one == sketchWith(13))
    assert(one == vs.distinct.sorted.take(K))
  }

  test("cardinality estimate within KMV error bound") {
    val rnd = new Random(11)
    val agg = new BottomKAggregator(K)
    for (n <- Seq(500, 5000, 50000)) {
      val vs = Seq.fill(n)(rnd.nextLong(1L << 60)).distinct
      val sk = vs.foldLeft(agg.zero)(agg.reduce)
      val est = (K - 1).toDouble * math.pow(2, 60) / sk.last.toDouble
      val relErr = math.abs(est - vs.size) / vs.size
      // Standard error 1/sqrt(k-2) ≈ 0.127; allow 4 sigma.
      assert(relErr < 4 / math.sqrt(K - 2),
        s"n=$n est=$est relErr=$relErr")
    }
  }

  test("kmv queries: estimates bounded, set algebra consistent") {
    val d = SparkEntry.queries("kmv_distinct")(spark, sfDir).collect()
    assert(d.nonEmpty)
    d.foreach { r =>
      val exact = r.getAs[Long]("exact_d")
      val size = r.getAs[Long]("sketch_size")
      val est = r.getAs[Double]("est_d")
      if (size < K) assert(est == exact.toDouble) // sub-k is exact
      else assert(math.abs(est - exact) / exact < 4 / math.sqrt(K - 2))
    }
    val u = SparkEntry.queries("kmv_union_intersect")(spark, sfDir).collect()
    assert(u.nonEmpty)
    u.foreach { r =>
      val exactU = r.getAs[Long]("exact_union")
      val estU = r.getAs[Double]("est_union")
      val estI = r.getAs[Double]("est_inter")
      assert(math.abs(estU - exactU) / exactU < 4 / math.sqrt(K - 2),
        s"union est $estU vs exact $exactU")
      // Intersection inherits union + Jaccard noise; loose sanity only:
      // the estimate stays within the union estimate and is nonnegative.
      assert(estI >= 0.0 && estI <= estU + 1e-9)
    }
  }
}
