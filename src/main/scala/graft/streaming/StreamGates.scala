package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-partition right-sizing for the registered streaming gates.
  *
  * A streaming query's stateful operators open one state store PER
  * SHUFFLE PARTITION per operator (a stream-stream join opens four),
  * and every micro-batch pays a fixed load/commit cost per store that
  * is completely independent of the rows in it — measured here at
  * tens of milliseconds per store per batch (provider setup, delta
  * write, coordinator reporting). The local gates hold kilobytes of
  * state, so running them at the session's cluster-shaped partition
  * count (32) buys no parallelism and multiplies that fixed cost:
  * `stream_asof` at 32 partitions spends ~9.5 s, at 4 partitions
  * ~2.7 s, with byte-identical output (profiled in round 11; the
  * cost scales linearly with partition count in both directions).
  *
  * State partitions should track STATE VOLUME, not cluster width —
  * the same rule a 1000-executor deployment applies in the opposite
  * direction (raise `spark.sql.shuffle.partitions` until per-store
  * state fits executor memory; Kafka deployments routinely run
  * hundreds of state partitions because their state is GBs). This
  * helper pins the gate's partition count while the stream runs and
  * restores the session's setting after, so batch queries in the
  * same session keep their cluster-shaped plans.
  */
object StreamGates {

  /** Per-store state at the local fixture scale is KBs; 4 partitions
    * keeps multi-store queries under a dozen store commits per batch
    * while still exercising real cross-partition shuffles.
    */
  val LocalStateParts = 4

  def withStateParts[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, LocalStateParts.toString)
    try body
    finally s.conf.set(key, prev)
  }
}
