package graft

/** Recall of the LSH-bucketed ANN paths against the exact brute-force
  * baseline. Multi-probe (own bucket + Hamming-1 neighbors) exists to
  * repair the recall the single-bucket path loses for vectors near a
  * hyperplane, so it must never do worse than single-bucket, and must
  * clear an absolute floor on the fixture embeddings.
  */
class LshRecallSpec extends SparkTestBase {

  private def topkSets(name: String): Map[Long, Set[Long]] =
    SparkEntry
      .queries(name)(spark, sfDir)
      .select("qid", "vec_id")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  test("multi-probe recall ≥ single-bucket recall, above floor") {
    val brute = topkSets("cosine_topk_brute")
    val single = topkSets("cosine_topk_lsh")
    val probe = topkSets("cosine_topk_lsh_probe")

    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = brute.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble /
          truth.size
      }
      per.sum / per.size
    }

    val rSingle = recall(single)
    val rProbe = recall(probe)
    info(f"recall@5 single-bucket=$rSingle%.2f multi-probe=$rProbe%.2f")
    assert(rProbe >= rSingle,
      s"multi-probe ($rProbe) must not lose recall vs single ($rSingle)")
    // Absolute floor: 4 planes = 16 buckets, and probing 5 of them
    // covers ~31% of the space for near-random fixture vectors, so
    // ~0.4 measured recall is the structural ceiling here (more
    // planes + more probes is the real-N configuration); 0.3 catches
    // a probing regression without flaking on the fixture.
    assert(rProbe >= 0.3, s"multi-probe recall too low: $rProbe")
  }
}
