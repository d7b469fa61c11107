package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Minimal accessor for `Dataset.ofRows`, which is `private[sql]` —
  * the standard way for an extension library to wrap a custom
  * LogicalPlan node into a user-facing DataFrame. Nothing else from
  * the private API surface is touched.
  */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(
      spark.asInstanceOf[ClassicSparkSession], plan)
}
