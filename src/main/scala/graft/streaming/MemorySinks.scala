package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Memory-sink hygiene for run-to-completion streaming queries: the
  * sink's temp view holds the full result in driver memory and stays
  * registered in the session catalog forever — so a long-lived session
  * repeatedly executing the registry (bench best-of-2, gate + specs in
  * one JVM) accumulates one sink table per invocation. `drain` copies
  * the completed sink into a local relation and DROPS the view,
  * leaving the result GC-bound to the returned DataFrame instead of
  * pinned by the catalog.
  *
  * Scale note: this does not change what crosses the driver — the
  * memory sink itself already materializes every row driver-side,
  * which is why only REPORT-SIZED streams use it; the deployable path
  * is the checkpointed file sink (`runStatefulStreamToParquet`).
  */
object MemorySinks {

  def drain(spark: SparkSession, sink: String): DataFrame = {
    val t = spark.table(sink)
    val drained = spark.createDataFrame(t.collectAsList(), t.schema)
    spark.catalog.dropTempView(sink)
    drained
  }
}
