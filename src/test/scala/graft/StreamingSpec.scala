package graft

import graft.streaming.StreamingEvents

/** The Dataflow-style replayability property: the streaming windowed
  * aggregation over the events files, run to completion with an
  * available-now trigger, equals the batch execution of the SAME
  * transform over the same files.
  */
class StreamingSpec extends SparkTestBase {

  test("stream (available-now) ≡ batch for the windowed aggregation") {
    val streamed = StreamingEvents
      .runToCompletion(spark, sfDir, "stream_spec_sink")
      .orderBy("day", "event_type")
      .collect()
      .toSeq
    val batch = StreamingEvents
      .windowedAgg(StreamingEvents.batch(spark, sfDir))
      .orderBy("day", "event_type")
      .collect()
      .toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("stream (available-now) ≡ batch for the SLIDING-window aggregation") {
    val q = StreamingEvents
      .slidingAgg(StreamingEvents.stream(spark, sfDir))
      .writeStream
      .format("memory")
      .queryName("sliding_spec_sink")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark
      .table("sliding_spec_sink")
      .orderBy("win_start", "event_type")
      .collect()
      .toSeq
    val batch = StreamingEvents
      .slidingAgg(StreamingEvents.batch(spark, sfDir))
      .orderBy("win_start", "event_type")
      .collect()
      .toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
    // Overlap sanity: every event lands in exactly two windows, so the
    // sliding row-count total is 2× the tumbling total.
    val tumbling = StreamingEvents
      .windowedAgg(StreamingEvents.batch(spark, sfDir))
      .agg(org.apache.spark.sql.functions.sum("n_events"))
      .collect()(0).getLong(0)
    val sliding = StreamingEvents
      .slidingAgg(StreamingEvents.batch(spark, sfDir))
      .agg(org.apache.spark.sql.functions.sum("n_events"))
      .collect()(0).getLong(0)
    assert(sliding == 2 * tumbling)
  }

  test("stream-stream time-bounded join ≡ batch join on replay") {
    val q = StreamingEvents
      .clickViewJoin(StreamingEvents.stream(spark, sfDir))
      .writeStream
      .format("memory")
      .queryName("ss_join_sink")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark
      .table("ss_join_sink")
      .orderBy("user_id", "click_id", "view_id")
      .collect()
      .toSeq
    val batch = StreamingEvents
      .clickViewJoin(StreamingEvents.batch(spark, sfDir))
      .orderBy("user_id", "click_id", "view_id")
      .collect()
      .toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming dedup (bounded state) removes the injected duplicates") {
    val q = StreamingEvents
      .dedupStream(spark, sfDir)
      .writeStream
      .format("memory")
      .queryName("dedup_stream_sink")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val deduped = spark.table("dedup_stream_sink")
    val nBatch = StreamingEvents.batch(spark, sfDir).count()
    // Input was the stream unioned with itself (2× every event);
    // exactly the distinct event set must survive.
    assert(deduped.count() == nBatch)
    assert(
      deduped.select("event_id").distinct().count() == nBatch)
  }
}
