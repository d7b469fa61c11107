package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.TwoStarCC

/** Randomized differential test for the two-star connected-components
  * operator: labels on arbitrary random multigraphs (duplicate edges,
  * both orientations, self-loops, skewed hubs) must equal a trivial
  * driver-side union-find. The example topologies in TwoStarCCSpec
  * cover the shapes we thought of; this covers the ones we didn't —
  * the star-operation edge cases live exactly in unordered/duplicated
  * input. Raw ScalaCheck generators with fixed seeds, the
  * CanonicalPropsSpec pattern (deterministic, offline-cache friendly).
  */
class TwoStarCCPropsSpec extends SparkTestBase {

  private def edgeGen(maxNode: Long): Gen[(Long, Long)] =
    for {
      // Square one endpoint's distribution toward low ids so hubs and
      // self-loops actually occur.
      a <- Gen.chooseNum(0L, maxNode)
      b <- Gen.chooseNum(0L, maxNode)
      flip <- Gen.oneOf(true, false)
    } yield if (flip) (a, math.min(b, a / 2 + b / 2)) else (a, b)

  private def graphGen: Gen[Seq[(Long, Long)]] =
    for {
      maxNode <- Gen.chooseNum(1L, 60L)
      nEdges <- Gen.chooseNum(1, 120)
      es <- Gen.listOfN(nEdges, edgeGen(maxNode))
    } yield es

  /** Driver-side union-find with min-id canonical roots. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        // min-id root so labels match the operator's contract
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    parent.keys.toSeq.map(n => n -> find(n)).toMap
  }

  test("random multigraphs label identically to union-find") {
    import spark.implicits._
    val params = Gen.Parameters.default
    val graphs = (0 until 25).flatMap(i =>
      graphGen.apply(params, Seed(1234L + i)).toSeq)
    assert(graphs.size >= 20, "generator produced too few graphs")
    graphs.zipWithIndex.foreach { case (g, i) =>
      val want = unionFind(g)
      val got = TwoStarCC
        .components(g.toDF("src", "dst"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == want,
        s"graph #$i (${g.size} edges): " +
          s"diff=${(got.toSet diff want.toSet).take(5)} / " +
          s"${(want.toSet diff got.toSet).take(5)}")
    }
  }
}
