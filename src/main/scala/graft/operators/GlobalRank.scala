package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global row numbering over a total order — the building
  * block for positional operators (ntile, global rank, exact positional
  * split) that must NOT plan as a single-partition WindowExec.
  *
  * `Window.orderBy(...)` with no partition key funnels the entire
  * table through ONE task; fine at sf0.1, a hard wall at 100×. This
  * helper instead composes the classic two-pass range scheme out of
  * ordinary Catalyst operators, so it stays LAZY (constructing the
  * frame runs no jobs) and the whole plan is visible to `.explain`:
  *
  *   1. explicit range repartition on the order key (parallel range
  *      exchange; the explicit partition count keeps AQE from
  *      re-coalescing it differently across the two consumers);
  *   2. per-partition local row numbers — a WindowExec PARTITIONED on
  *      the range-partition id (parallel, one task per range);
  *   3. partition offsets — counts per partition id, prefix-summed by
  *      the only unpartitioned window in the plan, which runs over
  *      O(#partitions) aggregated rows (thousands at cluster scale),
  *      never row data — then broadcast-joined back.
  *
  * Determinism: the order must be total (unique tiebreak), and the
  * range boundaries are sampled with fixed per-partition seeds, so
  * both consumers of the exchange see identical partition ids (the
  * physical plan reuses the exchange outright).
  */
object GlobalRank {

  /** `df` with an extra 1-based `rn` column following `order`, which
    * must be a total order (include a unique tiebreak column) for the
    * numbering to be deterministic.
    */
  def withRowNumber(
      df: DataFrame,
      order: Seq[Column],
      rnCol: String = "rn"): DataFrame = {
    val parts =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df
      .repartitionByRange(parts, order: _*)
      .withColumn("__gr_pid", spark_partition_id())
    val local = parted.withColumn(
      "__gr_lrn",
      row_number()
        .over(Window.partitionBy("__gr_pid").orderBy(order: _*))
        .cast("long"))
    val offsets = parted
      .groupBy("__gr_pid")
      .agg(count(lit(1)).as("__gr_cnt"))
      .withColumn(
        "__gr_off",
        coalesce(
          sum(col("__gr_cnt")).over(
            Window
              .orderBy("__gr_pid")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__gr_pid", "__gr_off")
    local
      .join(broadcast(offsets), Seq("__gr_pid"))
      .withColumn(rnCol, col("__gr_off") + col("__gr_lrn"))
      .drop("__gr_pid", "__gr_lrn", "__gr_off")
  }
}
