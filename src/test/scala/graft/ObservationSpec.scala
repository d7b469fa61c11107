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
}
