package graft

/** The batched BPE trainer exists to cut driver rounds (one
  * pair-count job per ROUND instead of per merge); it only counts if
  * it reproduces the sequential vocabulary where sequential BPE is
  * well-defined, and actually collapses rounds.
  *
  * Divergence contract (the well-known batched-BPE caveat, pinned
  * here with a concrete fixture): batching defers any candidate that
  * shares a symbol with a higher-ranked acceptance, which is exact as
  * long as no CASCADE pair (a pair containing a just-merged symbol,
  * e.g. "p ar" after "a r"→"ar") ties into the deferral window. On
  * the sf0.001 fixture exactly that happens — "a r" and "p a" tie at
  * n=1873, sequential's tiebreak takes "a r" then its cascade "p ar",
  * while batched (having deferred "a r" behind "p a") picks "p a" and
  * "m er". The sf0.01 GATE fixture has no such tie and the batched
  * vocabulary is identical there (also pinned every round by the
  * DuckDB oracle on bpe_train_batched).
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

  test("sf0.001 divergence is exactly the documented tie+cascade") {
    val seq = vocab("bpe_train_merges", sfDir)
    val bat = vocab("bpe_train_batched", sfDir)
    val shared = seq.intersect(bat)
    info(s"shared=${shared.size}/${seq.size}; " +
      s"seq-only=${seq -- bat}; bat-only=${bat -- seq}")
    // 6 of 8 merges identical; the two diverging slots are the tied
    // pair ("a r" vs "p a", both n=1873) and its downstream cascade.
    assert(shared.size >= seq.size - 2,
      s"divergence beyond the documented tie window: seq=$seq bat=$bat")
    assert((seq -- bat).exists(_._2 == 1873L) &&
      (bat -- seq).exists(_._2 == 1873L),
      "divergence is not the documented n=1873 tie")
  }

  test("driver rounds collapse vs one-merge-per-round") {
    val (rounds, merges) =
      operators.TextQueries.trainBpeMergesBatched(spark, sfDir)
    info(s"rounds=$rounds for ${merges.size} merges " +
      s"(sequential trainer would use ${merges.size})")
    assert(merges.nonEmpty)
    // Overlap skips can under-fill a batch, so the bound is not
    // ceil(n/K) exactly — but batching must at least halve the round
    // count on the fixture, or the job-count story is fiction.
    assert(rounds <= math.max(1, merges.size / 2),
      s"$rounds driver rounds for ${merges.size} merges — no collapse")
  }
}
