package graft

/** The bench's sweep-vs-floor adjudication, as pure predicates so the
  * partition property is unit-testable (Bench.scala applies them per
  * entry and in the tail counts).
  *
  * Every sweep entry that ran >2× its same-run isolated floor carries
  * EXACTLY ONE of two dispositions, split on what the CPU did:
  *
  *   - `sweepContended` — sweep wall >2× floor at essentially the
  *     floor's CPU (≤1.5×): the classic co-tenancy signature (the
  *     process was runnable but the box was busy; round-14 bisect).
  *   - `cpuInflated` — sweep wall >2× floor AND sweep CPU >1.5× the
  *     floor's: the cycles themselves degraded (thermal / cgroup
  *     throttling, CPU steal). The round-16 of-record run was this:
  *     51 entries 5-50× their floors with CPU grown 10-50× in
  *     lockstep, which the flat-CPU flag correctly refused to call
  *     co-tenancy — and the artifact then read "0 contended" on a run
  *     whose raw total was 2.05× its own adjusted total.
  *
  * An entry within 2× of its floor fires neither (the two runs agree;
  * any residual gap is the query's own work). The >1.5×-CPU threshold
  * is strict-vs-inclusive complementary between the two flags, so the
  * partition is total by construction: contended ∨ inflated ⟺
  * sweep > 2× floor.
  */
object BenchAdjud {

  def sweepContended(
      sweep: Double, sweepCpu: Double,
      iso: Double, isoCpu: Double): Boolean =
    sweep > 2 * iso && sweepCpu <= 1.5 * isoCpu

  def cpuInflated(
      sweep: Double, sweepCpu: Double,
      iso: Double, isoCpu: Double): Boolean =
    sweep > 2 * iso && sweepCpu > 1.5 * isoCpu
}
