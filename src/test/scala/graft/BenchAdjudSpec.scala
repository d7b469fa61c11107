package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins the bench's sweep-vs-floor adjudication partition: every
  * entry whose sweep ran >2× its isolated floor carries EXACTLY one
  * of {sweep_contended, cpu_inflated}, and an entry within 2× carries
  * neither — so a tail of "0 contended / 0 inflated" can only ever
  * describe a run whose raw total actually agrees with its floors.
  */
class BenchAdjudSpec extends AnyFunSuite {

  test("round-16 of-record proof case fires cpu_inflated, not contended") {
    // kmeans_refine in BENCH_r16.json: sweep 33.8 s at 47.1 CPU-s vs
    // same-run floor 1.03 s at 1.5 CPU-s — CPU grew in lockstep with
    // wall, so the flat-CPU co-tenancy flag must NOT fire and the
    // cpu_inflated disposition MUST.
    assert(!BenchAdjud.sweepContended(33.8, 47.1, 1.03, 1.5))
    assert(BenchAdjud.cpuInflated(33.8, 47.1, 1.03, 1.5))
  }

  test("flat-CPU co-tenancy fires sweep_contended, not cpu_inflated") {
    // round-15 signature: wall blew up, CPU did not.
    assert(BenchAdjud.sweepContended(10.0, 1.1, 1.0, 1.0))
    assert(!BenchAdjud.cpuInflated(10.0, 1.1, 1.0, 1.0))
  }

  test("an entry within 2x of its floor fires neither") {
    assert(!BenchAdjud.sweepContended(1.9, 1.9, 1.0, 1.0))
    assert(!BenchAdjud.cpuInflated(1.9, 50.0, 1.0, 1.0))
  }

  test("partition property: exactly one flag iff sweep > 2x floor") {
    val pos = Gen.choose(1e-3, 1e3)
    val quad = for {
      sweep <- pos; sweepCpu <- pos; iso <- pos; isoCpu <- pos
    } yield (sweep, sweepCpu, iso, isoCpu)
    val params = Gen.Parameters.default
    val cases = (0 until 500)
      .flatMap(i => quad.apply(params, Seed(0xAD7D0L + i)).toSeq)
    assert(cases.size >= 400)
    cases.foreach { case (sweep, sweepCpu, iso, isoCpu) =>
      val c = BenchAdjud.sweepContended(sweep, sweepCpu, iso, isoCpu)
      val i = BenchAdjud.cpuInflated(sweep, sweepCpu, iso, isoCpu)
      assert(!(c && i),
        s"dispositions overlap on ($sweep,$sweepCpu,$iso,$isoCpu)")
      assert((c || i) === (sweep > 2 * iso),
        s"partition hole on ($sweep,$sweepCpu,$iso,$isoCpu)")
    }
  }
}
