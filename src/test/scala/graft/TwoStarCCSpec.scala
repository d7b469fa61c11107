package graft

import org.apache.spark.sql.functions._
import graft.operators.TwoStarCC

/** The alternating large-star/small-star connected components: correct
  * labels on known topologies, and — the property that justifies its
  * existence next to min-label propagation — round count that stays
  * LOGARITHMIC when the component diameter is pathological.
  */
class TwoStarCCSpec extends SparkTestBase {

  private def edges(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def labelsOf(pairs: Seq[(Long, Long)]) =
    TwoStarCC
      .components(edges(pairs))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("cliques, chains, and singles-by-omission label to component minima") {
    // Two triangles bridged to nothing, one 4-chain, one isolated edge.
    val g = Seq[(Long, Long)](
      (1L, 2L), (2L, 3L), (3L, 1L), // triangle {1,2,3}
      (10L, 11L), (11L, 12L), (12L, 10L), // triangle {10,11,12}
      (20L, 21L), (21L, 22L), (22L, 23L), // chain {20..23}
      (30L, 31L)) // edge {30,31}
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L,
      30L -> 30L, 31L -> 30L)
    assert(labelsOf(g) == want)
  }

  test("long-chain component converges in logarithmic rounds") {
    // A 200-node path: diameter 199. Min-label propagation needs
    // ~199 rounds (its fail-loud cap is 50); two-star must label the
    // whole chain to node 0 in a handful of alternating rounds.
    val chain = (0L until 199L).map(i => (i, i + 1))
    val (labels, rounds) = TwoStarCC.run(edges(chain))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 200)
    assert(got.forall(_._2 == 0L),
      s"non-min labels: ${got.filter(_._2 != 0L).take(5).toSeq}")
    assert(rounds <= 12, s"expected O(log n) rounds, took $rounds")
  }

  test("matches min-label propagation on the near-dup fixture graph") {
    val viaTwoStar = SparkEntry
      .queries("dedup_clusters_twostar")(spark, sfDir)
      .collect()
      .map(_.toString)
      .toSeq
    val viaLabelProp = SparkEntry
      .queries("dedup_clusters")(spark, sfDir)
      .collect()
      .map(_.toString)
      .toSeq
    assert(viaTwoStar == viaLabelProp)
    assert(viaTwoStar.nonEmpty)
  }
}
