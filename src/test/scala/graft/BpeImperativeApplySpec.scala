package graft

/** The imperative per-word BPE apply (the 30k-merge production fast
  * path) must land on EXACTLY the segmentation the declarative
  * dictionary computes — including the consumed-delimiter wart where
  * a match cannot start on the symbol right after a merge. Differential
  * over the whole fixture vocabulary, not samples.
  */
class BpeImperativeApplySpec extends SparkTestBase {

  test("imperative per-word apply ≡ declarative dictionary") {
    val merges = SparkEntry
      .queries("bpe_train_merges")(spark, sfDir)
      .collect()
      .map(_.getString(1))
      .toSeq
      .map { p =>
        val Array(a, b) = p.split(" ")
        (a, b)
      }
    assert(merges.length >= 5, s"only ${merges.length} merges learned")

    val dict = operators.TextQueries
      .bpeDictionary(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(dict.nonEmpty)

    dict.foreach { case (raw, nSyms) =>
      val imp = operators.TextQueries.applyMergesImperative(raw, merges)
      assert(imp.mkString("") == raw,
        s"'$raw': symbols do not reassemble the word: $imp")
      assert(imp.length.toLong == nSyms,
        s"'$raw': imperative ${imp.length} symbols vs declarative " +
          s"$nSyms — the fast path diverged from the replace semantics")
    }
  }
}
