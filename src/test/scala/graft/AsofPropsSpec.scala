package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.MiscQueries

/** Randomized differential for the merge-based as-of join: on
  * synthetic tie-heavy event frames (same-instant click+view, several
  * views per instant, users with no views at all) the windowed
  * implementation must equal a brute-force per-click scan of "latest
  * view at-or-before, ties inclusive, max event_id per instant".
  * The gate oracle pins it against DuckDB SQL that uses the SAME
  * window trick; this spec pins the SEMANTICS against an independent
  * formulation. Fixed seeds, CanonicalPropsSpec pattern.
  */
class AsofPropsSpec extends SparkTestBase {

  // (event_id, user_id, event_type, tus)
  private def frameGen: Gen[Seq[(Long, Long, String, Long)]] =
    for {
      n <- Gen.chooseNum(1, 250)
      rows <- Gen.listOfN(
        n,
        for {
          u <- Gen.chooseNum(0L, 4L)
          // Tiny instant domain scaled to µs → constant ties, incl.
          // click and view at the same instant.
          t <- Gen.chooseNum(0L, 30L)
          typ <- Gen.oneOf("click", "view", "view", "scroll")
        } yield (u, typ, t * 1000000L + (t % 3) * 250000L))
    } yield rows.zipWithIndex.map { case ((u, typ, tus), i) =>
      (i.toLong, u, typ, tus)
    }

  /** Directional/tolerance-aware brute force, mirroring
    * [[MiscQueries.asofJoinDir]]'s contract independently.
    */
  private def bruteDir(
      rows: Seq[(Long, Long, String, Long)],
      forward: Boolean,
      tolUs: Option[Long])
      : Set[(Long, Long, Option[Long], Option[Long])] = {
    val dedupedViews = rows
      .filter(_._3 == "view")
      .groupBy(r => (r._2, r._4))
      .map { case ((u, tus), vs) => (u, tus, vs.map(_._1).max) }
      .toSeq
    rows.filter(_._3 == "click").map { case (cid, u, _, ctus) =>
      val cands = dedupedViews.filter(v =>
        v._1 == u && (if (forward) v._2 >= ctus else v._2 <= ctus))
      val best =
        if (cands.isEmpty) None
        else Some(if (forward) cands.minBy(_._2) else cands.maxBy(_._2))
      val inTol = best.filter(b =>
        tolUs.forall(t =>
          (if (forward) b._2 - ctus else ctus - b._2) <= t))
      inTol match {
        case Some(b) =>
          val gap = if (forward) b._2 - ctus else ctus - b._2
          (u, cid, Some(b._3), Some(gap / 1000000L))
        case None => (u, cid, None, None)
      }
    }.toSet
  }

  private def runDiff(
      forward: Boolean, tolUs: Option[Long], seedBase: Long): Unit = {
    import spark.implicits._
    val params = Gen.Parameters.default
    val cases = (0 until 10).flatMap(i =>
      frameGen.apply(params, Seed(seedBase + i)).toSeq)
    assert(cases.size >= 8)
    cases.zipWithIndex.foreach { case (rows, i) =>
      val got = MiscQueries
        .asofJoinDir(
          rows.toDF("event_id", "user_id", "event_type", "tus"),
          forward, tolUs)
        .collect()
        .map(r => (
          r.getLong(0),
          r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      val want = bruteDir(rows, forward, tolUs)
      assert(got == want,
        s"case #$i (${rows.size} events, fwd=$forward tol=$tolUs): " +
          s"extra=${(got diff want).take(3)} missing=${(want diff got).take(3)}")
    }
  }

  test("random tie-heavy frames: windowed as-of ≡ brute-force scan") {
    runDiff(forward = false, tolUs = None, seedBase = 9090L)
  }

  test("forward as-of ≡ brute-force earliest-at-or-after scan") {
    runDiff(forward = true, tolUs = None, seedBase = 7171L)
  }

  test("tolerance-bounded as-of ≡ brute-force with gap cutoff") {
    // 5 s tolerance over a 0–30 s instant domain: both bound-hit and
    // bound-miss cases occur constantly.
    runDiff(forward = false, tolUs = Some(5000000L), seedBase = 5252L)
    runDiff(forward = true, tolUs = Some(5000000L), seedBase = 6363L)
  }
}
