package graft

import org.apache.spark.sql.functions._
import graft.operators.UnigramQueries

import scala.util.Random

/** Unigram tokenizer internals: the integer sixteenth-bit log2
  * quantizer stays within one unit of the real thing, and the
  * HOF-expression Viterbi DP equals brute-force enumeration of every
  * segmentation under the same (cost, n_pieces) lexicographic
  * objective — on random vocabularies with random costs, including
  * tie-heavy ones.
  */
class UnigramPropsSpec extends SparkTestBase {

  private val Enc = 1L << 20

  test("q16 is a monotone floor-ish 1/16-bit log2, within two units") {
    // q16 truncates the value to its top five bits before the table
    // lookup, and the table itself floors — so q16 UNDERestimates
    // 16·log2 and never overestimates. Analytic worst case over the
    // 16 mantissa cells: max_m (16·log2((m+1)/16) − T[m]) ≈ 2.15
    // units at m=19. Monotone in n (truncation and table are both
    // monotone).
    val probe = (1L to 2000L) ++
      Seq(1L << 20, (1L << 20) + 7, 1L << 40, (1L << 52) + 12345)
    var prev = Long.MinValue
    probe.foreach { n =>
      val q = UnigramQueries.q16(n)
      assert(q >= prev, s"q16 not monotone at $n")
      prev = q
      val exact = 16.0 * math.log(n.toDouble) / math.log(2.0)
      assert(exact - q >= -1e-9 && exact - q <= 2.25,
        s"q16($n)=$q vs 16·log2=$exact")
    }
  }

  /** All segmentations of w into vocab pieces (lengths 1–4), best by
    * (cost, n) lexicographic — exponential, fine at |w| ≤ 10.
    */
  private def brute(w: String, costs: Map[String, Long]): Option[Long] = {
    if (w.isEmpty) return Some(0L)
    val cands = (1 to math.min(4, w.length)).flatMap { l =>
      val piece = w.take(l)
      costs.get(piece).flatMap(c =>
        brute(w.drop(l), costs).map(rest => rest + c * Enc + 1))
    }
    if (cands.isEmpty) None else Some(cands.min)
  }

  test("Viterbi DP ≡ brute-force enumeration on random vocabularies") {
    import spark.implicits._
    val rnd = new Random(31337)
    val alphabet = "abc"
    for (trial <- 0 until 15) {
      // Random multi-char pieces over a 3-letter alphabet (dense
      // overlaps → many co-optimal paths), plus every single char so
      // all words segment. Small random costs make ties frequent.
      val multi = Seq.fill(6 + rnd.nextInt(6)) {
        val len = 2 + rnd.nextInt(3)
        (0 until len).map(_ => alphabet(rnd.nextInt(3))).mkString
      }.distinct
      val costs =
        (alphabet.map(_.toString) ++ multi)
          .map(p => p -> (1L + rnd.nextInt(6)))
          .toMap
      val words = Seq.fill(40)(
        (0 until (1 + rnd.nextInt(9)))
          .map(_ => alphabet(rnd.nextInt(3))).mkString).distinct
      val got = words.toDF("w")
        .withColumn("key", UnigramQueries.viterbiKey(col("w"), costs))
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
      words.foreach { w =>
        val want = brute(w, costs)
        assert(want.contains(got(w)),
          s"trial $trial word '$w': dp=${got(w)} " +
            s"(cost=${got(w) / Enc}, n=${got(w) % Enc}) brute=$want")
      }
    }
  }

  test("registered unigram queries: coverage and consistency") {
    val vocab = SparkEntry.queries("unigram_vocab")(spark, sfDir).collect()
    assert(vocab.nonEmpty)
    // Cost is a surprisal: most frequent piece has the smallest cost;
    // all costs nonnegative.
    val costs = vocab.map(r => r.getAs[Long]("cnt") -> r.getAs[Long]("cost"))
    assert(costs.forall(_._2 >= 0))
    assert(costs.maxBy(_._1)._2 == costs.map(_._2).min)
    val seg = SparkEntry.queries("unigram_segment")(spark, sfDir).collect()
    seg.foreach { r =>
      val w = r.getAs[String]("w")
      val n = r.getAs[Long]("n_pieces")
      // 1 ≤ pieces ≤ |w| (never more pieces than characters).
      assert(n >= 1 && n <= w.length, s"'$w' segmented into $n pieces")
    }
  }
}
