package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.MisraGriesAggregator

/** Randomized check of the Misra-Gries theorem the `heavy_hitters`
  * query leans on, over arbitrary streams and arbitrary partition
  * splits (the distributed reduce+merge shape): for every item,
  * estimate ∈ [true − n/(K+1), true], and every item with true
  * frequency > n/(K+1) survives the merge. Pure JVM — no Spark jobs —
  * so hundreds of random streams cost milliseconds. Fixed seeds, the
  * CanonicalPropsSpec pattern.
  */
class MisraGriesPropsSpec extends AnyFunSuite {

  private def streamGen: Gen[Seq[String]] =
    for {
      nDistinct <- Gen.chooseNum(1, 40)
      n <- Gen.chooseNum(1, 2000)
      // Zipf-ish: low item ids exponentially more likely, so real
      // heavy hitters exist alongside a long tail.
      items <- Gen.listOfN(
        n,
        Gen.frequency(
          8 -> Gen.chooseNum(0, math.max(0, nDistinct / 8)),
          3 -> Gen.chooseNum(0, math.max(0, nDistinct / 2)),
          1 -> Gen.chooseNum(0, nDistinct)))
    } yield items.map(i => s"item$i")

  test("estimate bounds and heavy-item retention hold on random streams") {
    val params = Gen.Parameters.default
    val streams = (0 until 60).flatMap(i =>
      streamGen.apply(params, Seed(777L + i)).toSeq)
    assert(streams.size >= 50)
    streams.zipWithIndex.foreach { case (stream, i) =>
      val k = 4 + i % 13
      val agg = new MisraGriesAggregator(k)
      val n = stream.size
      val bound = n / (k + 1)
      val truth =
        stream.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }

      // Random partitioning into 1..6 chunks, reduced independently
      // and merged in order — the distributed execution shape.
      val nChunks = 1 + (i * 31) % 6
      val size = math.max(1, n / nChunks)
      val bufs = stream.grouped(size).toSeq
        .map(c => c.foldLeft(agg.zero)(agg.reduce))
      val m = agg.finish(bufs.reduce(agg.merge))

      assert(m.size <= k, s"stream #$i: summary ${m.size} > K=$k")
      m.foreach { case (item, est) =>
        val t = truth(item)
        assert(est <= t && est >= t - bound,
          s"stream #$i: $item est=$est outside [${t - bound}, $t]")
      }
      truth.filter(_._2 > bound).keys.foreach { heavy =>
        assert(m.contains(heavy),
          s"stream #$i: heavy item $heavy (freq ${truth(heavy)} > " +
            s"$bound) missing from summary")
      }
    }
  }
}
