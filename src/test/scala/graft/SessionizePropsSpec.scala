package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.Sessionize

/** Randomized differential for the window-function sessionizer on
  * gap-BOUNDARY-heavy synthetic streams: inter-event gaps drawn
  * mostly from {1799, 1800, 1801} seconds (±sub-second parts), where
  * the split decision actually lives. The contract under test is the
  * batch definition every streaming twin is pinned to: sort per user
  * by (ts, event_id), split when whole-second timestamps differ by
  * MORE than 1800 (unix_timestamp truncates to seconds BEFORE the
  * difference — a 1800.9 s µs-gap can still be one session). Brute
  * force replays that rule in plain Scala.
  */
class SessionizePropsSpec extends SparkTestBase {

  // Per user: a start instant plus a walk of boundary-flavored gaps.
  private def streamGen: Gen[Seq[(Long, Long, Long)]] =
    for {
      nUsers <- Gen.chooseNum(1, 4)
      walks <- Gen.sequence[Seq[Seq[(Long, Long)]], Seq[(Long, Long)]](
        (0L until nUsers).map { u =>
          for {
            n <- Gen.chooseNum(1, 60)
            start <- Gen.chooseNum(0L, 3600L)
            gaps <- Gen.listOfN(
              n - 1,
              Gen.frequency(
                6 -> Gen.chooseNum(1799000000L, 1801999999L),
                2 -> Gen.chooseNum(0L, 120000000L),
                1 -> Gen.chooseNum(0L, 4000000000L)))
          } yield gaps
            .scanLeft(start * 1000000L + (start % 7) * 130000L)(_ + _)
            .map(t => (u, t))
        })
    } yield walks.flatten.zipWithIndex.map { case ((u, tus), i) =>
      (i.toLong, u, tus)
    }

  private def brute(rows: Seq[(Long, Long, Long)])
      : Set[(Long, String, Long, Long)] = {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    rows.groupBy(_._2).flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._1))
      val sessions =
        scala.collection.mutable.ArrayBuffer(
          scala.collection.mutable.ArrayBuffer(sorted.head))
      sorted.tail.foreach { e =>
        if (e._3 / 1000000L - sessions.last.last._3 / 1000000L > 1800L)
          sessions += scala.collection.mutable.ArrayBuffer(e)
        else sessions.last += e
      }
      sessions.map { ss =>
        val s = ss.head._3 / 1000000L
        val e = ss.last._3 / 1000000L
        (u, fmt.format(java.time.Instant.ofEpochSecond(s)),
          ss.size.toLong, e - s)
      }
    }.toSet
  }

  test("boundary-gap streams: sessionizeBatch ≡ brute-force splitter") {
    import spark.implicits._
    val params = Gen.Parameters.default
    val cases = (0 until 10).flatMap(i =>
      streamGen.apply(params, Seed(5150L + i)).toSeq)
    assert(cases.size >= 8)
    cases.zipWithIndex.foreach { case (rows, i) =>
      val ev = rows
        .toDF("event_id", "user_id", "us")
        .select(col("event_id"), col("user_id"),
          timestamp_micros(col("us")).as("ts"))
      val got = Sessionize.sessionizeBatch(ev)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = brute(rows)
      assert(got == want,
        s"case #$i (${rows.size} events): " +
          s"extra=${(got diff want).take(3)} missing=${(want diff got).take(3)}")
    }
  }
}
