package graft

import graft.streaming.StreamNearDup

/** The stateful streaming near-dup must agree EXACTLY with an
  * independent batch implementation of the same corpus-capped
  * contract on the same input — the stateful machinery (bounded
  * ListState buckets, overflow poisoning, multi-batch replay) must be
  * invisible in the answer. The DuckDB oracle is the second,
  * engine-external pin (CORRECTNESS gate).
  */
class StreamNearDupSpec extends SparkTestBase {

  test("streaming screen ≡ independent batch twin, and finds matches") {
    val cap = graft.operators.TextQueries.BucketCap
    val streamed = StreamNearDup.run(spark, sfDir, cap).collect().toSeq
    val batch = StreamNearDup.batchTwin(spark, sfDir, cap)
      .collect().toSeq
    assert(streamed.nonEmpty,
      "no near-dups found — the fixture has cross-split duplicates")
    assert(streamed === batch,
      s"stateful pipeline diverged from the batch twin:\n" +
        s"stream=${streamed.take(5)}...\nbatch=${batch.take(5)}...")
  }
}
