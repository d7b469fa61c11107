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
}
