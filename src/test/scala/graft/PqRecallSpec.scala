package graft

/** Recall of the product-quantization ANN path against the exact
  * squared-L2 baseline (computed directly over the fixture embeddings
  * here — 500×64 floats, trivially exact driver-side in a test).
  * PQ replaces each 8-dim sub-vector with one of 16 codewords, so its
  * distances are approximations; the spec pins how much ranking
  * quality that 32× compression costs on the fixture, that the
  * asymmetric-distance ranking is not degenerate (all-same-code), and
  * that the exact re-rank stage (`pq_topk_rerank`) recovers recall
  * the coarse quantizer loses — the production PQ deployment shape.
  */
class PqRecallSpec extends SparkTestBase {

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def recallOf(
      name: String, truth: Map[Long, Set[Long]]): Double = {
    val got = SparkEntry
      .queries(name)(spark, sfDir)
      .select("qid", "vec_id")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val per = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    per.sum / per.size
  }

  test("pq recall@5 vs exact L2; rerank recovers; codes not degenerate") {
    val emb = Tables
      .documents(spark, sfDir) // touch to keep session config identical
      .sparkSession
      .read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
      .collect()
      .map(r =>
        r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

    val queries = emb.keys.filter(_ < 5).toSeq.sorted
    val truth: Map[Long, Set[Long]] = queries.map { q =>
      val qe = emb(q)
      q -> emb.toSeq
        .filter(_._1 != q)
        .map { case (id, e) => (id, l2sq(qe, e)) }
        .sortBy { case (id, d) => (d, id) }
        .take(5)
        .map(_._1)
        .toSet
    }.toMap

    val adcRecall = recallOf("pq_topk", truth)
    val rerankRecall = recallOf("pq_topk_rerank", truth)
    info(f"pq adc recall@5 = $adcRecall%.2f, rerank = $rerankRecall%.2f")

    // 16 codewords per 8-dim subspace on near-random 64-dim fixture
    // vectors is still a coarse quantizer; the floor catches a broken
    // encode (e.g. wrong subspace slicing collapses recall toward the
    // 5/499 ≈ 0.01 random baseline) without flaking on fixture noise.
    assert(adcRecall >= 0.2, s"pq adc recall too low: $adcRecall")

    // The re-rank stage scores its 25-candidate shortlist with EXACT
    // L2, so any true neighbor the ADC scan ranks in its top 25
    // surfaces into the final top 5 — recall must not drop below the
    // raw ADC ranking and must clear a higher absolute bar.
    assert(rerankRecall >= adcRecall,
      s"rerank lost recall: $rerankRecall < $adcRecall")
    assert(rerankRecall >= 0.5, s"rerank recall too low: $rerankRecall")

    // Non-degeneracy: if every vector mapped to the same codeword
    // tuple, all ADC distances per query would be equal and ranking
    // would be pure id order 0..5 for every query.
    val firstRanks = SparkEntry
      .queries("pq_topk")(spark, sfDir)
      .select("qid", "vec_id", "rnk")
      .collect()
      .filter(_.getInt(2) == 1)
      .map(_.getLong(1))
      .toSet
    assert(firstRanks.size > 1,
      "all queries ranked the same nearest id — degenerate codes")
  }
}
