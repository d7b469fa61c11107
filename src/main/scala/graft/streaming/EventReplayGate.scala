package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end gate for the `eventreplay` MicroBatchStream: exactly-once
  * delivery ACROSS A KILL/RESTART BOUNDARY, proven through the oracle.
  *
  * The run stages the events fixture as a TSV log, then executes TWO
  * streaming queries against ONE checkpoint:
  *
  *   - phase 1 sees only half the log (`maxRows` — the deterministic
  *     stand-in for a mid-stream kill), rate-limited to several
  *     micro-batches by admission control, into a checkpointed parquet
  *     sink;
  *   - phase 2 reopens the same checkpoint with the full log visible.
  *     Its start offset comes from the OFFSET LOG, not from
  *     `initialOffset` — asserted here by row arithmetic: phase 2 must
  *     ingest exactly `total − half` rows (resumption), never `total`
  *     (replay-from-zero) or fewer (lost rows).
  *
  * The final sink must contain every event exactly once — the oracle
  * (a straight projection of the events table) catches duplicates and
  * holes by row count and hash.
  */
object EventReplayGate {

  def run(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.Fs.sinkDir("graft_event_replay")
    graft.Fs.deleteRecursively(base)
    val stage = s"$base/stage"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"

    // Stage the log: one TSV line per event, integer-only fields so
    // the text round-trip is format-exact.
    graft.Tables.events(spark, dir)
      .select(concat_ws("\t",
        col("event_id"),
        graft.Tables.tsMicros(col("ts")),
        col("user_id"),
        col("event_type"),
        graft.operators.Money.cents(col("value"))).as("value"))
      .coalesce(1)
      .write.mode("overwrite").text(stage)
    val log = new java.io.File(stage).listFiles()
      .filter(_.getName.startsWith("part-"))
      .map(_.getAbsolutePath)
      .head
    val total = spark.read.text(log).count()
    require(total > 10, s"staged replay log has only $total rows")
    val half = total / 2
    val perBatch = math.max(1L, total / 5)

    def runPhase(maxRows: Option[Long]): (Long, Int) = {
      val rd = spark.readStream
        .format(classOf[graft.sources.EventReplayDataSource].getName)
        .option("path", log)
        .option("rowsPerBatch", perBatch.toString)
      maxRows.foreach(m => rd.option("maxRows", m.toString))
      val q = rd.load()
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val progress = q.recentProgress.toSeq
      (progress.map(_.numInputRows).sum,
        progress.count(_.numInputRows > 0))
    }

    val (rows1, batches1) = runPhase(Some(half))
    require(rows1 == half,
      s"phase 1 ingested $rows1 rows, expected $half — admission " +
        "control or the maxRows horizon is broken")
    require(batches1 >= 2,
      s"phase 1 ran in $batches1 data micro-batch(es); the " +
        s"$perBatch-row admission cap should have split $half rows " +
        "into several — rate limiting is not engaging")
    val (rows2, _) = runPhase(None)
    require(rows2 == total - half,
      s"phase 2 ingested $rows2 rows, expected ${total - half} — " +
        "restart did not resume from the committed offset " +
        "(replay-from-zero would show the full row count, lost " +
        "offsets fewer)")

    StreamingEvents.assertEmitted(
      spark.read.parquet(out), "stream_v2_source")
      .orderBy("event_id")
  }
}
