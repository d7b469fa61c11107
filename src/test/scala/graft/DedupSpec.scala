package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.Vectors._

/** Behavioral specs for the dedup/similarity primitives on a corpus
  * with KNOWN duplicates and near-duplicates (the driver testdata has
  * none, so these pin detection behavior, not just determinism).
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "The  quick brown FOX jumps over the lazy dog"), // exact dup mod norm? (case+ws only)
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (3L, "completely different content about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog"), // byte-exact dup of 0
    (5L, "spark engines process completely different content")
  ).toDF("doc_id", "text")

  test("normText collapses case and whitespace → exact dedup finds dups") {
    val normed = corpus.select(normText($"text").as("n"))
    val distinct = normed.distinct().count()
    // 0, 1 and 4 normalize identically → 4 distinct of 6
    assert(distinct == 4)
  }

  test("hash60 fingerprints: equal iff normalized text equal") {
    val fp = corpus
      .select($"doc_id", hash60(normText($"text")).as("fp"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(fp(0L) == fp(1L) && fp(0L) == fp(4L))
    assert(fp(0L) != fp(2L) && fp(2L) != fp(3L))
    assert(fp.values.forall(_ >= 0L))
  }

  test("word-shingles: count and guard for short docs") {
    val sh = corpus
      .select(size(wordShingles(tokens($"text"), 3)).as("n"))
      .collect()
      .map(_.getInt(0))
    assert(sh.forall(_ > 0))
    val tiny = Seq((9L, "two words")).toDF("doc_id", "text")
    assert(tiny
      .select(size(wordShingles(tokens($"text"), 3)).as("n"))
      .head()
      .getInt(0) == 0)
  }

  test("minhash: identical docs agree on all slots; near-dups on most") {
    val tok = corpus
      .select($"doc_id",
        explode(array_distinct(tokens(normText($"text")))).as("t"))
      .withColumn("h", hash60($"t"))
    val aggs = (0 until 8).map(i => min(minhashSlot($"h", i)).as(s"h$i"))
    val sigs = tok
      .groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong))
      .toMap
    assert(sigs(0L) == sigs(4L)) // identical text → identical signature
    val nearMatches = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    val farMatches = sigs(0L).zip(sigs(3L)).count { case (a, b) => a == b }
    // 8/9 shared unigrams vs ~0 shared → near must beat far
    assert(nearMatches > farMatches)
  }

  test("cosine: self-similarity is 1.0, orthogonal is 0") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 2.0f, 0.0f)),
      (2L, Array(3.0f, 0.0f, 0.0f))
    ).toDF("id", "v")
    val a = vecs.select($"id".as("ia"), $"v".as("va"))
    val b = vecs.select($"id".as("ib"), $"v".as("vb"))
    val sims = a
      .crossJoin(b)
      .select($"ia", $"ib", cosine($"va", $"vb").as("sim"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(math.abs(sims((0L, 2L)) - 1.0) < 1e-12) // colinear
    assert(math.abs(sims((0L, 1L))) < 1e-12) // orthogonal
    assert(math.abs(sims((0L, 0L)) - 1.0) < 1e-12)
  }

  test("LSH buckets: colinear vectors land in the same bucket") {
    val vecs = Seq(
      (0L, Array.tabulate(8)(i => (i + 1).toFloat)),
      (1L, Array.tabulate(8)(i => (i + 1) * 2.0f)), // same direction
      (2L, Array.tabulate(8)(i => -(i + 1).toFloat)) // opposite
    ).toDF("id", "v")
    val buckets = vecs
      .select($"id", lshBucket($"v", 4).as("b"))
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    assert(buckets(0L) == buckets(1L))
    assert(buckets(0L) != buckets(2L))
  }
}
