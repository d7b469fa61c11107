package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash60

/** The deterministic weighted sampler's selling point, measured:
  * under priority = hash60(id) DIV w, heavier items dominate the
  * bottom-k sample, and the draw is a pure function of the ids
  * (identical across runs and partitionings).
  */
class WeightedSampleSpec extends SparkTestBase {

  test("heavier weights dominate the sample; draw is deterministic") {
    import spark.implicits._
    // 100 heavy (w=1000) + 900 light (w=1) items: with priorities
    // scaled down 1000× for heavy items, the bottom-50 should be
    // almost entirely heavy. Deterministic given the fixed hash.
    val items = ((0 until 100).map(i => (i.toLong, 1000L)) ++
      (100 until 1000).map(i => (i.toLong, 1L)))
    def draw(parts: Int): Seq[Long] = items.toDF("id", "w")
      .repartition(parts)
      .withColumn("h", hash60(col("id").cast("string")))
      .withColumn("priority", expr("h DIV w"))
      .orderBy(col("priority"), col("id"))
      .limit(50)
      .collect().map(_.getLong(0)).toSeq
    val sample = draw(4)
    val nHeavy = sample.count(_ < 100)
    assert(nHeavy >= 45,
      s"only $nHeavy/50 heavy items sampled — weighting not effective")
    // Determinism across partitioning.
    assert(draw(1) == sample && draw(13) == sample)
  }

  test("registered query: k per group, ranks contiguous, priority sorted") {
    val rows = SparkEntry.queries("weighted_sample")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val ranks = rs.map(_.getAs[Int]("smp_rank")).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"$src ranks: $ranks")
      val pr = rs.sortBy(_.getAs[Int]("smp_rank"))
        .map(_.getAs[Long]("priority")).toSeq
      assert(pr == pr.sorted, s"$src priorities out of order")
    }
  }
}
