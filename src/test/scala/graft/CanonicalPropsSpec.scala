package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Canonical

/** Property tests (SURVEY.md §5.2 item 4) for canonicalization and
  * safe-cast semantics, evaluated through the actual Spark expressions
  * (not a reimplementation). Uses raw ScalaCheck generators with a
  * fixed seed (the scalatest-scalacheck bridge artifact is not in the
  * offline cache).
  */
class CanonicalPropsSpec extends SparkTestBase {
  import spark.implicits._

  private val titleGen: Gen[String] = Gen
    .listOf(
      Gen.frequency(
        8 -> Gen.alphaNumChar,
        3 -> Gen.const(' '),
        2 -> Gen.oneOf('\'', ':', '—', '.', '-', '!', '7'),
        1 -> Gen.oneOf('é', 'ü', '中')
      ))
    .map(_.mkString)

  /** 200 deterministic samples. */
  private val samples: Seq[String] = {
    val params = Gen.Parameters.default
    (0 until 200).flatMap(i =>
      titleGen.apply(params, Seed(42L + i)).toSeq)
  }

  private def canonOf(ss: Seq[String]): Seq[String] =
    ss.toDF("t")
      .select(Canonical.canonicalizeTitle($"t"))
      .collect()
      .map(_.getString(0))
      .toSeq

  test("canonicalization is idempotent for arbitrary strings") {
    val once = canonOf(samples)
    val twice = canonOf(once)
    assert(once == twice)
  }

  test("canonical output is always lowercase alphanumeric+single-space") {
    canonOf(samples).foreach { c =>
      assert(
        c.forall(ch => ch.isDigit || (ch >= 'a' && ch <= 'z') || ch == ' '),
        s"unexpected char in canonical form: '$c'")
      assert(!c.matches(".*\\s{2,}.*"), s"uncollapsed whitespace: '$c'")
    }
  }

  test("safeRank: numeric strings parse, junk becomes 0") {
    val cases = Seq("5", "0", "123", "NR", "X", "", " 7", "3.5", "-2")
    val got = cases
      .toDF("r")
      .select(Canonical.safeRank($"r"))
      .collect()
      .map(_.getInt(0))
      .toSeq
    // try_cast(' 7') trims → 7; '3.5' is not an int → 0 (documented:
    // stricter than pandas to_numeric, which would yield 3)
    assert(got == Seq(5, 0, 123, 0, 0, 0, 7, 0, -2))
  }
}
