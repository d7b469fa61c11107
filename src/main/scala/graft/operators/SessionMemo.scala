package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, dir) memo for eagerly-materialized
  * (`graft.Checkpoints.pin`)
  * DataFrames that several registered queries share — the near-dup
  * cluster labels and the purchase-graph edge list. One fixpoint /
  * edge build per gate run instead of one per consumer.
  *
  * Entries keyed by a STOPPED session are evicted on the next access,
  * so a long-lived JVM cycling sessions (test suites) does not pin
  * dead sessions' lineage and checkpoint blocks forever.
  */
private[operators] final class SessionMemo {
  private val cache = new ConcurrentHashMap[(SparkSession, String), DataFrame]

  def getOrCompute(s: SparkSession, d: String)(build: => DataFrame): DataFrame = {
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    cache.computeIfAbsent((s, d), _ => build)
  }
}
