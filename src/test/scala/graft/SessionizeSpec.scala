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

  test("event-time-timeout sessionizer emits exactly the closed sessions") {
    import org.apache.spark.sql.functions._
    // The continuous form keeps the open session in GroupState and
    // closes it via event-time timeout. On a replay, the final
    // watermark is max(ts) (0s delay), so exactly the batch sessions
    // with end + gap < max(ts) are provably closed and must be
    // emitted; later sessions stay open in state (correct — a longer
    // stream could extend them).
    val streamed = Sessionize
      .runStatefulStreamToCompletion(spark, sfDir, "session_stateful_sink")
      .orderBy("user_id", "session_start")
      .collect()
      .toSeq
    val events = graft.Tables.events(spark, sfDir)
    val maxTsSec = events
      .agg(max(unix_timestamp(col("ts"))))
      .collect()(0)
      .getLong(0)
    val expected = Sessionize
      .sessionizeBatch(events)
      .withColumn(
        "end_sec",
        unix_timestamp(
          to_timestamp(col("session_start"), "yyyy-MM-dd HH:mm:ss"))
          + col("duration_secs"))
      .filter(col("end_sec") + Sessionize.GapSeconds + 1 <= maxTsSec)
      .select("user_id", "session_start", "n_events", "duration_secs")
      .orderBy("user_id", "session_start")
      .collect()
      .toSeq
    assert(streamed.nonEmpty)
    assert(streamed.size == expected.size,
      s"closed-session count: streamed=${streamed.size} expected=${expected.size}")
    assert(streamed == expected)
  }

  test("checkpointed parquet sink ≡ memory sink (file-sink round trip)") {
    // The deployable sink shape: same stateful stream, written to
    // parquet files with a checkpoint, read back from disk. Append
    // mode emits each closed session exactly once, so the files must
    // equal the memory-sink output row for row.
    val viaFiles = Sessionize
      .runStatefulStreamToParquet(spark, sfDir)
      .orderBy("user_id", "session_start")
      .collect()
      .toSeq
    val viaMemory = Sessionize
      .runStatefulStreamToCompletion(spark, sfDir, "session_pq_twin_sink")
      .orderBy("user_id", "session_start")
      .collect()
      .toSeq
    assert(viaFiles.nonEmpty)
    assert(viaFiles == viaMemory)
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
