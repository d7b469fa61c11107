package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Scalable global row numbering over a total order — the building
  * block for positional operators (ntile, global rank, exact positional
  * split) that must NOT plan as a single-partition WindowExec.
  *
  * `Window.orderBy(...)` with no partition key funnels the entire
  * table through ONE task; fine at sf0.1, a hard wall at 100×. This
  * helper instead uses the classic two-pass range scheme, which keeps
  * every stage parallel:
  *
  *   1. range-shuffle + per-partition sort (`orderBy` — Spark plans a
  *      parallel RangePartitioning exchange, no global funnel);
  *   2. count each sorted partition and prefix-sum the counts on the
  *      driver (O(#partitions) scalars — thousands at cluster scale,
  *      never row-scale);
  *   3. per-partition map adds `offset + local index`.
  *
  * Steps 2–3 are exactly `RDD.zipWithIndex`, so the imperative surface
  * is limited to Spark's own primitive — the one place the RDD layer
  * is genuinely the right tool (a per-partition positional map with a
  * driver-side O(#partitions) side input has no Catalyst equivalent).
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
    val sorted = df.orderBy(order: _*)
    val schema = sorted.schema.add(rnCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
