package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingEvents

/** The watermark drop proven at the STATE OPERATOR, not only through
  * the output: Spark's own `numRowsDroppedByWatermark` counter must
  * read zero in phase 1 (nothing arrives late) and exactly the late
  * volume in phase 2.
  *
  * Exactly what the counter counts is itself a pinned finding: the
  * stateful aggregation sits ABOVE the map-side partial aggregation,
  * so late input rows reach the state store already combined into
  * (window, event_type) partial rows — the counter reads the GROUP
  * count, not the raw row count (445 vs 520 at sf0.001). The fixture
  * stages phase 2 as one small parquet file → one input partition →
  * one combine domain, so the group count is exact; on a multi-
  * partition ingest the counter would sit between the group and row
  * counts.
  */
class LateDropCounterSpec extends SparkTestBase {

  test("phase-2 drop counter equals the late (window, type) groups") {
    val (result, dropped1, dropped2) =
      StreamingEvents.lateDropRun(spark, sfDir)

    val late = StreamingEvents.batch(spark, sfDir)
      .filter(col("ts") < lit(StreamingEvents.LateSplit))
    val lateRows = late.count()
    val lateGroups = late
      .select(date_trunc("hour", col("ts")), col("event_type"))
      .distinct()
      .count()

    assert(dropped1 == 0L,
      s"phase 1 dropped $dropped1 rows — nothing arrives late there")
    assert(dropped2 == lateGroups,
      s"phase 2 dropped $dropped2 state rows; the late set combines " +
        s"into $lateGroups (window, type) groups ($lateRows raw rows)")
    assert(result.count() > 0)
  }
}
