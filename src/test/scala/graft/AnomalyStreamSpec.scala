package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming EWMA anomaly screen ≡ an in-memory fold of the same
  * integer recurrence over globally (ts, event_id)-sorted events —
  * the independent-formulation differential beside the gate's
  * recursive-CTE oracle.
  */
class AnomalyStreamSpec extends SparkTestBase {

  test("anomaly stream matches the sequential integer recurrence") {
    val sink = "anom_spec_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = graft.streaming.StreamingEvents.anomalyStream(spark, sfDir)
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = graft.streaming.MemorySinks.drain(spark, sink)
      .select("event_type", "seq", "event_id", "dev_cents", "flagged",
        "ewma_cents", "ewmad_cents")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getLong(5),
          r.getLong(6)))
      .toMap

    // Independent fold: plain Scala over the sorted slice.
    val rows = Tables.events(spark, sfDir)
      .filter(col("event_id") <
        graft.streaming.StreamingEvents.AnomMaxEventId)
      .select(col("event_id"), col("event_type"),
        Tables.tsMicros(col("ts")).as("tus"),
        graft.operators.Money.cents(col("value")).as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    var nFlagged = 0
    rows.groupBy(_._2).foreach { case (typ, evs) =>
      var ewma = 0L; var ewmad = 0L; var seq = 0L
      evs.sortBy(e => (e._3, e._1)).foreach { case (id, _, _, cents) =>
        seq += 1
        val want =
          if (seq == 1L) { ewma = cents; ewmad = 0L; (id, 0L, false, ewma, ewmad) }
          else {
            val dev = math.abs(cents - ewma)
            val flagged = ewmad > 0 && dev > 4 * ewmad
            ewma += (cents - ewma) / 8
            ewmad += (dev - ewmad) / 8
            if (flagged) nFlagged += 1
            (id, dev, flagged, ewma, ewmad)
          }
        assert(got((typ, seq)) == want,
          s"($typ, seq=$seq): stream=${got((typ, seq))} fold=$want")
      }
    }
    assert(got.size == rows.length, "stream emitted a row per event")
  }
}
