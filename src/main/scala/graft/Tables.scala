package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet star schema
  * (/root/testdata/sf{0.001,0.01,0.1} — see TESTDATA.md / FIXTURES.md §B).
  *
  * All queries read through here so the scan shape is uniform: a plain
  * parquet scan that Catalyst can push filters into and prune columns
  * from. At 100 TB the same call sites work unchanged against a
  * partitioned table root — nothing below assumes single-file layout.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts is ns-precision parquet (FIXTURES.md §B), which Spark's
    * TimestampType (µs) cannot hold: with
    * spark.sql.legacy.parquet.nanosAsLong=true the column arrives as a
    * raw ns long and is truncated here to µs — a conscious precision
    * decision (SURVEY.md §7.4); all registered event queries aggregate
    * at ≥second granularity so the truncation is observationally
    * irrelevant.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
