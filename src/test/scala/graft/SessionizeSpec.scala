package graft

import graft.streaming.Sessionize

/** The custom-state streaming surface: flatMapGroupsWithState
  * sessionization over the replayed events files must produce exactly
  * the batch window-function sessionization.
  */
class SessionizeSpec extends SparkTestBase {

  test("flatMapGroupsWithState sessions ≡ batch window sessions") {
    val streamed = Sessionize
      .runStreamToCompletion(spark, sfDir, "session_spec_sink")
      .orderBy("user_id", "session_start")
      .collect()
      .toSeq
    val batch = Sessionize
      .sessionizeBatch(graft.Tables.events(spark, sfDir))
      .orderBy("user_id", "session_start")
      .collect()
      .toSeq
    assert(streamed.nonEmpty)
    assert(streamed.size == batch.size)
    assert(streamed == batch)
  }

  test("sessions split at >30min gaps (sanity on synthetic group)") {
    import spark.implicits._
    val evs = Seq(
      Sessionize.Ev(1L, 1L, 0L),
      Sessionize.Ev(1L, 2L, 60L * 1000000L), // +1 min: same session
      Sessionize.Ev(1L, 3L, 4000L * 1000000L) // +~66 min: new session
    )
    val out = Sessionize
      .sessionizeGroup(1L, evs.iterator, null)
      .toSeq
    assert(out.size == 2)
    assert(out.head.n_events == 2 && out.head.duration_secs == 60L)
    assert(out(1).n_events == 1 && out(1).duration_secs == 0L)
  }
}
