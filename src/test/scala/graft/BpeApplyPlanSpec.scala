package graft

/** The tokenizer-apply scale property: `bpe_apply`'s plan depth must
  * be independent of how many merges were learned. The dictionary
  * folds the merge expression in Checkpoints-pinned segments, so the
  * plan a consumer executes sees the finished dictionary as a pinned
  * scan — ZERO replace expressions — however long the merge list is
  * (the round-6 form held one replace PER MERGE in a single tree,
  * which dies at a real 30k-merge vocabulary).
  */
class BpeApplyPlanSpec extends SparkTestBase {

  test("bpe_apply plan holds no per-merge expressions") {
    val merges =
      SparkEntry.queries("bpe_train_merges")(spark, sfDir).collect()
    // More merges than the pin stride, or the test proves nothing:
    // a single unpinned segment would also show few replaces.
    assert(merges.length >= 5,
      s"fixture learned only ${merges.length} merges — the plan-depth " +
        "assertion needs more merges than one pinned segment")

    val df = SparkEntry.queries("bpe_apply")(spark, sfDir)
    val plan = df.queryExecution.analyzed.toString
    val nReplace =
      """(?<!regexp_)replace\(""".r.findAllIn(plan).size
    assert(nReplace == 0,
      s"bpe_apply plan still carries $nReplace replace expressions " +
        s"for ${merges.length} merges — depth must not track merges:\n" +
        plan.take(2000))

    // And the depth-bounded plan still computes: every doc with a
    // ≥2-char token reports, compression never exceeds 1e6 ppm.
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("compression_ppm") <= 1000000L))
  }
}
