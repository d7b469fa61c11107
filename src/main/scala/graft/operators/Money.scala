package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.round

/** THE money-determinism convention, defined once: per-row half-up
  * rounding to integer cents BEFORE any aggregation, so every engine
  * sums identical longs (doubles only ever reappear through single
  * IEEE divisions of exact integers). Every oracle mirrors it as
  * `CAST(round(x*100) AS BIGINT)` — a change here must change all
  * oracle SQL with it.
  */
private[graft] object Money {
  def cents(c: Column): Column = round(c * 100).cast("long")
}
