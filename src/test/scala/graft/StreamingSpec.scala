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

  test("stream-STATIC enrichment join ≡ batch (per-batch broadcast, no join state)") {
    val q = StreamingEvents
      .staticEnrichAgg(
        StreamingEvents.stream(spark, sfDir),
        graft.Tables.customer(spark, sfDir))
      .writeStream
      .format("memory")
      .queryName("stream_static_sink")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("stream_static_sink")
      .orderBy("segment").collect().toSeq
    val batch = StreamingEvents
      .staticEnrichAgg(
        StreamingEvents.batch(spark, sfDir),
        graft.Tables.customer(spark, sfDir))
      .orderBy("segment").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
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

  test("stream-stream LEFT OUTER join: inner ≡ batch, outer complete past the watermark horizon") {
    import org.apache.spark.sql.functions._
    val q = StreamingEvents
      .clickViewLeftJoin(StreamingEvents.stream(spark, sfDir))
      .writeStream
      .format("memory")
      .queryName("ss_louter_sink")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1),
        Option(r.get(3)).map(_.toString).getOrElse(""))
    val streamed = spark.table("ss_louter_sink").collect().map(key).toSet
    val batchDf =
      StreamingEvents.clickViewLeftJoin(StreamingEvents.batch(spark, sfDir))
    val batch = batchDf.collect().map(key).toSet

    val streamedInner = streamed.filter(_._3.nonEmpty)
    val batchInner = batch.filter(_._3.nonEmpty)
    assert(streamedInner == batchInner, "inner results must match batch")

    val streamedOuter = streamed.filter(_._3.isEmpty)
    val batchOuter = batch.filter(_._3.isEmpty)
    assert(streamedOuter.nonEmpty, "some unmatched clicks must flush")
    assert(streamedOuter.subsetOf(batchOuter),
      "streamed outer rows must be a subset of batch outer rows")

    // Completeness: every batch outer click strictly older than the
    // final GLOBAL watermark must have flushed. The global watermark
    // is the MIN across both watermarked inputs minus the 1 h delay —
    // notably NOT max(event ts): if the last click postdates the last
    // view, that click sits above its own stream's contribution and
    // stays buffered forever on a finite replay (observed: the
    // fixture's final click is exactly this row). One minute of slack
    // keeps the assertion off Spark's eviction-boundary strictness.
    val ev = StreamingEvents.batch(spark, sfDir)
    val maxClick = ev.filter(col("event_type") === "click")
      .agg(max(col("ts"))).collect()(0).getTimestamp(0).getTime
    val maxView = ev.filter(col("event_type") === "view")
      .agg(max(col("ts"))).collect()(0).getTimestamp(0).getTime
    val watermark = math.min(maxClick, maxView) - 3600 * 1000L
    val horizon = watermark - 60 * 1000L
    val mustFlush = batchDf
      .filter(col("view_id").isNull &&
        col("click_ts") < lit(new java.sql.Timestamp(horizon)))
      .collect().map(key).toSet
    assert(mustFlush.subsetOf(streamedOuter),
      s"${(mustFlush -- streamedOuter).size} outer rows older than the " +
        "watermark horizon failed to flush")
  }

  test("stream-stream FULL OUTER join: inner ≡ batch, both outer directions ⊆ batch and flush past their horizons") {
    import org.apache.spark.sql.functions._
    val q = StreamingEvents
      .clickViewFullJoin(StreamingEvents.stream(spark, sfDir))
      .writeStream
      .format("memory")
      .queryName("ss_fouter_sink")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0),
        Option(r.get(1)).map(_.toString).getOrElse(""),
        Option(r.get(3)).map(_.toString).getOrElse(""))
    val streamed = spark.table("ss_fouter_sink").collect().map(key).toSet
    val batchDf =
      StreamingEvents.clickViewFullJoin(StreamingEvents.batch(spark, sfDir))
    val batch = batchDf.collect().map(key).toSet

    val inner = (s: Set[(Long, String, String)]) =>
      s.filter(r => r._2.nonEmpty && r._3.nonEmpty)
    assert(inner(streamed) == inner(batch), "inner results must match batch")

    val streamedClickOuter = streamed.filter(r => r._3.isEmpty)
    val streamedViewOuter = streamed.filter(r => r._2.isEmpty)
    assert(streamedClickOuter.subsetOf(batch.filter(_._3.isEmpty)),
      "streamed click-outer rows must be a subset of batch")
    assert(streamedViewOuter.subsetOf(batch.filter(_._2.isEmpty)),
      "streamed view-outer rows must be a subset of batch")

    // Horizons: the global watermark is min(max click, max view) − 1 h.
    // A click flushes unmatched once the watermark passes its own ts;
    // a view once it passes view_ts + 1 h (its match window extends
    // one hour FORWARD in click time). One minute of slack each.
    val ev = StreamingEvents.batch(spark, sfDir)
    val maxClick = ev.filter(col("event_type") === "click")
      .agg(max(col("ts"))).collect()(0).getTimestamp(0).getTime
    val maxView = ev.filter(col("event_type") === "view")
      .agg(max(col("ts"))).collect()(0).getTimestamp(0).getTime
    val watermark = math.min(maxClick, maxView) - 3600 * 1000L
    val slack = 60 * 1000L
    val clickHorizon = new java.sql.Timestamp(watermark - slack)
    val viewHorizon =
      new java.sql.Timestamp(watermark - 3600 * 1000L - slack)
    val mustFlushClicks = batchDf
      .filter(col("view_id").isNull && col("click_ts") < lit(clickHorizon))
      .collect().map(key).toSet
    assert(mustFlushClicks.subsetOf(streamedClickOuter),
      s"${(mustFlushClicks -- streamedClickOuter).size} click-outer rows " +
        "older than the horizon failed to flush")
    val mustFlushViews = batchDf
      .filter(col("click_id").isNull && col("view_ts") < lit(viewHorizon))
      .collect().map(key).toSet
    assert(mustFlushViews.subsetOf(streamedViewOuter),
      s"${(mustFlushViews -- streamedViewOuter).size} view-outer rows " +
        "older than the horizon failed to flush")
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
