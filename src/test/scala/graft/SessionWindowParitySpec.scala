package graft

import org.apache.spark.sql.functions._
import graft.streaming.Sessionize

/** The two batch sessionizers must pin each other: the declarative
  * `session_window` aggregation and the window-function sessionizer
  * (`Sessionize.sessionizeBatch`) implement the same >30-minute-gap
  * semantics through entirely different plans, so a silent event-time
  * drift (the round-8 ns→µs fixture regeneration compressed the
  * timeline 1000× through ONE loader while the other adapted) breaks
  * their agreement loudly here even if each one's oracle is stale.
  */
class SessionWindowParitySpec extends SparkTestBase {

  test("session_window sessions ≡ window-function sessionizer") {
    val ev = Tables.events(spark, sfDir)

    // session_window rendered in sessionizeBatch's output vocabulary:
    // start formatted at second precision, duration as whole-second
    // difference of first/last event (sw.end is last + gap, so the
    // session members, not the window bounds, define duration).
    val sw = ev
      .groupBy(
        col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
      .select(
        col("user_id"),
        date_format(col("first_ts"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n_events"),
        (unix_timestamp(col("last_ts")) - unix_timestamp(col("first_ts")))
          .as("duration_secs"))

    val batch = Sessionize.sessionizeBatch(ev)

    assert(sw.count() > 0, "no sessions produced at all")
    val onlySw = sw.exceptAll(batch).count()
    val onlyBatch = batch.exceptAll(sw).count()
    assert(onlySw == 0 && onlyBatch == 0,
      s"sessionizer disagreement: $onlySw sessions only in " +
        s"session_window, $onlyBatch only in the window-function form")
  }
}
