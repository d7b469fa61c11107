package graft

import org.apache.spark.sql.functions._

/** The streaming-observe gate's claim is exactness under micro-batch
  * decomposition: per-batch CollectMetrics counters summed across the
  * replay equal the one-pass batch aggregates over the same log.
  * (The registered query returns the summed totals; the per-batch
  * plumbing — >=3 observed batches — is asserted inside the gate.)
  */
class StreamObserveSpec extends SparkTestBase {

  test("summed per-batch observed metrics equal the batch truth") {
    val row = SparkEntry.queries("stream_observe_metrics")(
      spark, sfDir).collect().head
    val truth = Tables.events(spark, sfDir)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(graft.operators.Money.cents(col("value")))
          .as("sum_cents"),
        count(when(col("value") > 100.0, 1)).as("n_big"),
        count(when(col("props").isNull || col("props") === "", 1))
          .as("n_blank_props"))
      .collect().head
    assert(row == truth)
    // Degenerate-fixture guard: the big-value counter must actually
    // count something, or the gate can't distinguish "exact" from
    // "never incremented".
    assert(row.getAs[Long]("n_rows") > 0)
    assert(row.getAs[Long]("n_big") > 0)
  }
}
