package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sources.{EventReplayAdmission, EventReplayOffset}

/** Randomized invariants for the eventreplay source's pure pieces —
  * the admission-budget allocator and the composite-offset codec
  * (the CanonicalPropsSpec pattern: raw fixed-seed ScalaCheck
  * generators, no scalatest bridge).
  *
  * The allocator invariants are exactly the exactly-once arithmetic
  * the gates rely on: an allocation that over-serves a partition
  * duplicates rows; one that under-sums starves the budget; a
  * non-deterministic one breaks checkpoint-replay equality.
  */
class EventReplayPropsSpec extends SparkTestBase {

  private case class Case(
      starts: IndexedSeq[Long], ends: IndexedSeq[Long], budget: Long)

  private val caseGen: Gen[Case] = for {
    n <- Gen.choose(1, 8)
    starts <- Gen.listOfN(n, Gen.choose(0L, 5000L))
    backlogs <- Gen.listOfN(n, Gen.choose(-50L, 5000L))
    budget <- Gen.choose(0L, 8000L)
  } yield Case(
    starts.toIndexedSeq,
    starts.zip(backlogs).map { case (s, b) => s + b }.toIndexedSeq,
    budget)

  private val cases: Seq[Case] = {
    val params = Gen.Parameters.default
    (0 until 500).flatMap(i => caseGen.apply(params, Seed(777L + i)).toSeq)
  }

  test("allocate: sums to min(budget, backlog), never over-serves") {
    assert(cases.size >= 400)
    cases.foreach { c =>
      val avail = c.starts.indices
        .map(i => math.max(0L, c.ends(i) - c.starts(i)))
      val alloc = EventReplayAdmission.allocate(c.starts, c.ends, c.budget)
      assert(alloc.length == c.starts.length)
      assert(alloc.forall(_ >= 0L), s"negative allocation in $alloc")
      alloc.indices.foreach(i =>
        assert(alloc(i) <= avail(i),
          s"partition $i over-served: ${alloc(i)} > ${avail(i)} ($c)"))
      assert(alloc.sum == math.min(c.budget, avail.sum),
        s"allocation ${alloc.sum} != min(${c.budget}, ${avail.sum}) ($c)")
      // Deterministic: same inputs, same split.
      assert(alloc ==
        EventReplayAdmission.allocate(c.starts, c.ends, c.budget))
    }
  }

  test("allocate: proportional up to the rounding unit") {
    // Each partition's share is within 1 row of exact
    // proportionality after the floor + remainder hand-out — the
    // fairness bound that keeps one partition from starving another.
    cases.filter(c => c.budget > 0).foreach { c =>
      val avail = c.starts.indices
        .map(i => math.max(0L, c.ends(i) - c.starts(i)))
      val total = avail.sum
      if (total > c.budget) {
        val alloc =
          EventReplayAdmission.allocate(c.starts, c.ends, c.budget)
        alloc.indices.foreach { i =>
          val floor = c.budget * avail(i) / total
          assert(alloc(i) >= floor && alloc(i) <= floor + 1,
            s"partition $i allocation ${alloc(i)} not in " +
              s"[$floor, ${floor + 1}] ($c)")
        }
      }
    }
  }

  test("composite offsets round-trip through their JSON form") {
    val posGen = for {
      n <- Gen.choose(1, 12)
      ps <- Gen.listOfN(n, Gen.choose(0L, Long.MaxValue / 2))
    } yield ps.toIndexedSeq
    val params = Gen.Parameters.default
    val seqs =
      (0 until 300).flatMap(i => posGen.apply(params, Seed(99L + i)).toSeq)
    assert(seqs.size >= 250)
    seqs.foreach { ps =>
      val o = EventReplayOffset(ps)
      assert(EventReplayOffset.parse(o.json(), ps.length) == o,
        s"round-trip failed for ${o.json()}")
    }
  }
}
