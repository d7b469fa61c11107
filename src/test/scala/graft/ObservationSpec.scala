package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** `Dataset.observe` — in-flight metrics collected DURING an action
  * (one scan, no second job): the monitoring surface a production
  * pipeline hangs row-count/quality gauges on. The observed values
  * must equal a separately-computed aggregate over the same data.
  */
class ObservationSpec extends SparkTestBase {

  test("observe() metrics match a direct aggregate, with no extra scan") {
    val obs = Observation("cust_obs")
    val cents = round(col("c_acctbal") * 100).cast("long")
    val base = Tables.customer(spark, sfDir)

    val observed = base.observe(
      obs,
      count(lit(1)).as("n_rows"),
      sum(cents).as("sum_cents"),
      max(col("c_custkey")).as("max_key"))
    val actionCount = observed.count()

    val direct = base
      .agg(
        count(lit(1)).as("n_rows"),
        sum(cents).as("sum_cents"),
        max(col("c_custkey")).as("max_key"))
      .head()

    val metrics = obs.get
    assert(metrics("n_rows") == actionCount)
    assert(metrics("n_rows") == direct.getAs[Long]("n_rows"))
    assert(metrics("sum_cents") == direct.getAs[Long]("sum_cents"))
    assert(metrics("max_key") == direct.getAs[Long]("max_key"))
  }

  test("observe_metrics registry query equals a dedicated aggregate pass") {
    val row = SparkEntry.queries("observe_metrics")(spark, sfDir).head()
    val direct = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") =!= "P")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"),
        count(when(col("o_totalprice") > 200000.0, 1)).as("n_big"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .head()
    for (c <- Seq("n_rows", "sum_cents", "n_big", "min_key", "max_key"))
      assert(row.getAs[Long](c) == direct.getAs[Long](c), c)
    // The piggybacked counters saw every surviving row.
    assert(row.getAs[Long]("n_rows") > 0)
  }
}
