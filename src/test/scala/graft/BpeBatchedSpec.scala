package graft

/** The batched BPE trainer exists to cut driver rounds (one
  * pair-count job per ROUND instead of per merge); it only counts if
  * it reproduces the sequential vocabulary and actually collapses
  * rounds where the data allows.
  *
  * r19 contract (strengthened): a batch is the maximal PREFIX of the
  * sorted candidates that is provably the sequential trainer's next
  * merges — acceptance stops at the first overlap-deferral and trims
  * count-ties with the best non-accepted candidate, so the batched
  * vocabulary (pairs AND at-acceptance counts) is EXACTLY the
  * sequential one at every scale. The price is graceful degradation:
  * on tie-dense degenerate corpora (sf0.001's n=1873 tie + cascade,
  * the round-18 documented divergence this closes) rounds approach
  * one-merge-per-round; at gate scale counts separate and batches
  * fill, which is where the job-count story matters.
  */
class BpeBatchedSpec extends SparkTestBase {

  private def vocab(name: String, dir: String): Set[(String, Long)] = {
    SparkEntry.queries(name)(spark, dir)
      .select("pair", "n").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
  }

  test("batched == sequential vocabulary at the gate scale (sf0.01)") {
    val d = "/root/testdata/sf0.01"
    val seq = vocab("bpe_train_merges", d)
    val bat = vocab("bpe_train_batched", d)
    assert(bat === seq,
      s"batched vocabulary diverged from sequential at gate scale:\n" +
        s"  sequential: $seq\n  batched:    $bat")
  }

  test("batched == sequential vocabulary on the degenerate corpus " +
      "(sf0.001 — the round-18 tie+cascade divergence is closed)") {
    val seq = vocab("bpe_train_merges", sfDir)
    val bat = vocab("bpe_train_batched", sfDir)
    assert(bat === seq,
      s"batched vocabulary diverged from sequential at sf0.001:\n" +
        s"  sequential: $seq\n  batched:    $bat")
  }

  test("driver rounds collapse where counts separate (sf0.01)") {
    val (rounds, merges) =
      operators.TextQueries.trainBpeMergesBatched(
        spark, "/root/testdata/sf0.01")
    info(s"sf0.01: rounds=$rounds for ${merges.size} merges " +
      s"(sequential trainer would use ${merges.size})")
    assert(merges.nonEmpty)
    // Tie-trimming can under-fill a batch, so the bound is not
    // ceil(n/K) exactly — but batching must at least halve the round
    // count at gate scale, or the job-count story is fiction.
    assert(rounds <= math.max(1, merges.size / 2),
      s"$rounds driver rounds for ${merges.size} merges — no collapse")
  }

  test("degenerate corpus degrades gracefully, never diverges " +
      "(sf0.001)") {
    val (rounds, merges) =
      operators.TextQueries.trainBpeMergesBatched(spark, sfDir)
    info(s"sf0.001: rounds=$rounds for ${merges.size} merges")
    assert(merges.nonEmpty)
    // Exactness is the contract here (asserted above); rounds may
    // approach one-per-merge on a tie-dense corpus but never exceed
    // the sequential trainer's count.
    assert(rounds <= merges.size,
      s"$rounds driver rounds for ${merges.size} merges")
  }
}
