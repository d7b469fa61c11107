package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key DISCOVERY for targeted salting — the wiring between the
  * `skew_report` observability (per-key grouped counts) and the
  * `join_salted_targeted` mitigation. At 100 TB hot keys must be
  * discovered, not declared: one grouped count over the fact side
  * (the same shuffle the join itself would do), a one-row mean
  * broadcast back over it, and a bounded top-K collect of the keys
  * whose count exceeds the threshold — never more than `maxKeys`
  * longs cross the driver, regardless of fact size.
  */
object SkewKeys {

  /** One discovery per (session, dir): the bench loop and every
    * consumer of the salted join reuse the same bounded collect.
    */
  private val memo = new SessionMemo[Seq[Long]]

  /** Keys of `df` (grouped by `key`) whose row count is at least
    * `minFactorX1000/1000 ×` the mean per-key count, heaviest first
    * (key ascending on ties — deterministic), capped at `maxKeys`.
    * An integer-scaled factor keeps the threshold arithmetic exact
    * in the comparison (`n * 1000 >= mean * factorX1000`).
    */
  def discover(
      df: DataFrame, key: Column,
      maxKeys: Int, minFactorX1000: Long): Seq[Long] = {
    val counts = df.groupBy(key.as("k")).agg(count(lit(1)).as("n"))
    val mean = counts.agg(avg(col("n")).as("mean"))
    counts
      .crossJoin(broadcast(mean)) // one-row stats side
      .filter(col("n") * lit(1000L) >= col("mean") * lit(minFactorX1000))
      .orderBy(col("n").desc, col("k").asc)
      .limit(maxKeys)
      .select(col("k").cast("long"))
      .collect().map(_.getLong(0)).toSeq
  }

  /** The hot customers of the orders fact — ≥1.5× the mean order
    * count, top 8. This is the list `join_salted_targeted` salts on;
    * the 1.5× threshold engages on the fixture's heaviest customers
    * at every scale while leaving the uniform majority unsalted.
    */
  def hotOrderCustkeys(s: SparkSession, d: String): Seq[Long] =
    memo.getOrCompute(s, d)(
      discover(graft.Tables.orders(s, d), col("o_custkey"),
        maxKeys = 8, minFactorX1000 = 1500L))
}
