package graft

import org.apache.spark.sql.functions._

/** The dynamic-gap session merge is the subtle part of
  * `session_window_dynamic`: windows [t, t+gap(row)) merge while a
  * window starts AT OR BEFORE the running maximum end (exact
  * boundary contact MERGES — discovered by this very sweep's first
  * failure; the fixture's microsecond-continuous timestamps can
  * never hit the boundary, so only a randomized sweep can see it).
  * The
  * registered oracle replays that rule on the fixture; this sweep
  * replays it on 150 seeded random timelines — including exact
  * boundary collisions (ts == running max end must MERGE) and equal
  * timestamps — against Spark's native session_window, so the
  * cumulative-max island derivation and the engine can never drift
  * unnoticed.
  */
class SessionWindowDynamicPropsSpec extends SparkTestBase {

  private val rnd = new scala.util.Random(0x5e55104dL)

  test("native dynamic session_window ≡ cumulative-max replay") {
    import spark.implicits._
    for (trial <- 1 to 150) {
      val n = 1 + rnd.nextInt(25)
      var us = 0L
      val rows = (1 to n).map { _ =>
        // Steps chosen so ties and exact gap-boundary hits occur:
        // gaps are 10 or 25 units; steps land on multiples of 5.
        us += 5L * rnd.nextInt(8)
        val kind = if (rnd.nextBoolean()) "short" else "long"
        (1L, us, kind)
      }
      val df = rows.toDF("user_id", "us", "kind")
        .withColumn("ts", timestamp_micros(col("us")))
      val got = df
        .groupBy(
          col("user_id"),
          session_window(col("ts"),
            when(col("kind") === "short", "10 microseconds")
              .otherwise("25 microseconds")).as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          unix_micros(col("sw.start")).as("start_us"),
          unix_micros(col("sw.end")).as("end_us"),
          col("n_events"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
        .toSeq
      // Driver-side replay: sort, split only when ts > running max
      // end — boundary contact merges.
      val sorted = rows.map { case (_, t, k) =>
        (t, if (k == "short") 10L else 25L)
      }.sortBy(_._1)
      val sessions = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long)] // (start, maxEnd, count)
      sorted.foreach { case (t, gap) =>
        if (sessions.nonEmpty && t <= sessions.last._2) {
          val (s0, e0, c0) = sessions.last
          sessions(sessions.length - 1) =
            (s0, math.max(e0, t + gap), c0 + 1)
        } else sessions += ((t, t + gap, 1L))
      }
      assert(got == sessions.toSeq,
        s"trial $trial: spark=$got replay=$sessions rows=$rows")
    }
  }
}
