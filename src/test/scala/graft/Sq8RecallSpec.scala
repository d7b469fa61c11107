package graft

/** The SQ8 path's selling point, measured: int8 codes preserve the
  * similarity ranking almost perfectly (measured recall@5 = 0.96 vs
  * exact cosine at sf0.001-scale fixtures), and the exact re-rank of
  * the 25-candidate shortlist recovers the remainder (measured 1.00).
  * Floors are set below the measured points so genuine regressions
  * fail without flaking on fixture regeneration.
  */
class Sq8RecallSpec extends SparkTestBase {

  private def topSet(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
      .toSet

  test("sq8 recall@5 ≥ 0.8; exact re-rank ≥ plain sq8") {
    val brute = topSet("cosine_topk_brute")
    val sq8 = topSet("sq8_topk")
    val rerank = topSet("sq8_topk_rerank")
    assert(brute.nonEmpty)
    val rSq8 = (brute & sq8).size.toDouble / brute.size
    val rRerank = (brute & rerank).size.toDouble / brute.size
    assert(rSq8 >= 0.8, s"sq8 recall@5 = $rSq8")
    assert(rRerank >= rSq8,
      s"rerank recall $rRerank below plain sq8 $rSq8")
    assert(rRerank >= 0.9, s"rerank recall@5 = $rRerank")
  }
}
