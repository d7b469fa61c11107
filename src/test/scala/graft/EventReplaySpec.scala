package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventReplayGate

/** The eventreplay MicroBatchStream's kill/restart gate, run in-suite:
  * the gate itself asserts admission control (≥2 rate-limited batches
  * in phase 1) and checkpoint resumption (phase 2 ingests exactly the
  * un-delivered remainder); here we additionally pin the END-TO-END
  * exactly-once result against the batch projection of the fixture.
  */
class EventReplaySpec extends SparkTestBase {

  test("kill/restart replay delivers every event exactly once") {
    val got = EventReplayGate.run(spark, sfDir)
    val want = Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        Tables.tsMicros(col("ts")).as("ts_us"),
        col("user_id"),
        col("event_type"),
        graft.operators.Money.cents(col("value")).as("value_cents"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "replayed rows differ from the batch projection")
  }
}
