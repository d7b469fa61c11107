package graft

import org.apache.spark.sql.SparkSession

/** SCALE.md's core determinism convention, evidenced directly:
  * results must be IDENTICAL under any partitioning (integer-cents
  * money, single-division means, left-to-right folds exist exactly so
  * re-partitioning never changes an answer). A child session with a
  * different shuffle width re-runs representative queries from each
  * family — aggregation, iterative fixpoint, ANN, the composed
  * funnel — and every row must match byte-for-byte.
  */
class PartitionInvarianceSpec extends SparkTestBase {

  private val names = Seq(
    "flagship", "curation_pipeline", "cosine_topk_lsh_hi",
    "kmeans_refine", "stats_corr",
    // round-7 additions, one per new family: PQ composition,
    // multi-signal clustering, expression-level segmentation,
    // hashed-bucket selection, robust alarm.
    "ivfpq_topk", "dedup_policy", "wordpiece_stats",
    "dsir_weights", "event_anomaly",
    // round-11 additions, one per new family: banded visual LSH,
    // grid spatial join, HITS integer normalization, rank-selected
    // robust trend, LSH tuning sweep, cumulative reach.
    "image_hist_lsh", "spatial_grid_join", "hits_scores",
    "theilsen_trend", "lsh_param_sweep", "reach_curve")

  test("representative queries are partition-count invariant") {
    val wide = spark
    val narrow: SparkSession = {
      val ns = spark.newSession()
      ns.conf.set("spark.sql.shuffle.partitions", "2")
      ns
    }
    names.foreach { name =>
      val a = SparkEntry.queries(name)(wide, sfDir)
        .collect().map(_.toString).toSeq
      val b = SparkEntry.queries(name)(narrow, sfDir)
        .collect().map(_.toString).toSeq
      assert(a == b,
        s"$name differs between shuffle widths 4 and 2:\n" +
          s"  wide=${a.take(3)}…\n  narrow=${b.take(3)}…")
    }
  }
}
