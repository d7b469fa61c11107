package graft

import org.apache.spark.sql.functions._

/** The streaming Misra-Gries summary's two claims:
  *
  *   - the stateful stream + exact recount lands on EXACTLY the batch
  *     `heavy_hitters` report (the determinism contract that lets both
  *     share one oracle);
  *   - the candidate state is genuinely bounded by NRanges·Cap — the
  *     property that makes the operator deployable at any vocabulary
  *     size.
  *
  * Plus the t-closeness audit's invariants (bounded distance, breach
  * counts consistent with group counts).
  */
class StreamHeavyHittersSpec extends SparkTestBase {

  test("streaming summary + recount ≡ batch heavy_hitters") {
    val batch = SparkEntry.queries("heavy_hitters")(spark, sfDir)
      .collect().toSeq
    val streamed =
      SparkEntry.queries("stream_heavy_hitters")(spark, sfDir)
        .collect().toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream/batch divergence: ${streamed.diff(batch)} vs " +
        s"${batch.diff(streamed)}")
  }

  test("candidate set is bounded by NRanges·Cap") {
    import graft.streaming.StreamHeavyHitters
    val cands = StreamHeavyHitters.candidates(spark, sfDir)
    val n = cands.count()
    assert(n > 0)
    assert(n <= StreamHeavyHitters.NRanges * StreamHeavyHitters.Cap,
      s"$n candidates exceed the summary bound")
  }

  test("t_closeness: distances bounded, breach counts consistent") {
    val rows = SparkEntry.queries("t_closeness")(spark, sfDir)
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val t = r.getAs[Double]("max_t")
      assert(t >= 0.0 && t <= 1.0, s"max_t $t out of [0,1]")
      val g = r.getAs[Long]("n_groups")
      val b = r.getAs[Long]("n_breach_groups")
      assert(b >= 0 && b <= g)
      // A breached group exists iff some group's t exceeds 1/2 —
      // and then the per-nation max must exceed 1/2 too.
      if (b > 0) assert(t > 0.5)
    }
    // The fixture bands are small (sub-0.5 distances would mean the
    // audit never fires); make sure the statistic discriminates.
    assert(rows.exists(_.getAs[Long]("n_breach_groups") > 0),
      "no nation breaches t=0.5 — audit not exercised by fixture")
  }
}
