package graft

/** Overlap independent driver actions (optimization-guide §2.6):
  * Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code
  * calls them sequentially. The report/multi-pin queries are chains
  * of bounded actions; submitted one by one, each job's straggler
  * tail leaves the box idle before the next job starts. Results
  * return in input order; failures propagate with the original
  * exception (unwrapped from ExecutionException so gate require()
  * messages survive).
  */
object Par {

  /** Run `thunks` on a bounded pool and return their results in
    * input order.
    *
    * The ≤4 bound is NOT a local[32] calibration — it is the guide's
    * own sizing rule ("2-3 jobs in flight is plenty: enough to fill
    * the tail, not so many that they fight for executors"), and it
    * is the safe direction on a real cluster too: each in-flight
    * job's tasks hold executor execution memory, so an unbounded
    * fan-out of concurrent actions multiplies per-executor memory
    * pressure (§5) while FIFO scheduling already lets a later job
    * only backfill cores the earlier jobs leave idle. Callers pass
    * few, coarse thunks (report sections, independent pin builds);
    * raising the bound buys nothing once the box is saturated.
    */
  def inParallel[T](thunks: Seq[() => T]): Seq[T] = {
    if (thunks.size <= 1) return thunks.map(_())
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(4, thunks.size))
    try
      thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[T] {
          override def call(): T = t()
        })
      }.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    finally pool.shutdown()
  }
}
