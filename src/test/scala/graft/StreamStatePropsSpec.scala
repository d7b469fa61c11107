package graft

import graft.streaming.StreamingEvents._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential specs for the pure per-key step functions
  * behind the streaming funnel and transition processors: random
  * event histories, random SECOND-ALIGNED batch splits (the arrival
  * contract), and adversarial within-batch shuffling must reproduce
  * the brute min-timestamp funnel and the sorted-chain transition
  * list exactly. Fixed seed — failures replay.
  */
class StreamStatePropsSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0x61234567L)

  private val Types = Vector("view", "click", "purchase", "other")

  private def randomHistory(n: Int): Seq[TransEv] = {
    var id = 0L
    (0 until n).map { _ =>
      id += 1 + rnd.nextInt(3)
      TransEv(1L, id, Types(rnd.nextInt(Types.length)),
        rnd.nextInt(8).toLong)
    }
  }

  /** Brute funnel: tv = min view sec; tc = min click sec >= tv;
    * tp = min purchase sec >= tc — straight from the batch
    * `event_funnel` definition, no state machine.
    */
  private def bruteFunnel(evs: Seq[TransEv]): (Long, Long, Long) = {
    def minSec(t: String, lo: Long): Long =
      evs.filter(e => e.event_type == t && e.tsSec >= lo)
        .map(_.tsSec).sorted.headOption.getOrElse(-1L)
    val tv = minSec("view", Long.MinValue)
    val tc = if (tv < 0) -1L else minSec("click", tv)
    val tp = if (tc < 0) -1L else minSec("purchase", tc)
    (tv, tc, tp)
  }

  /** Split a (tsSec, id)-sorted history into batches that never cut
    * inside one second, then shuffle WITHIN each batch (arrival
    * order inside a micro-batch is arbitrary).
    */
  private def secondAlignedBatches(
      evs: Seq[TransEv]): Seq[Seq[TransEv]] = {
    val sorted = evs.sortBy(e => (e.tsSec, e.event_id))
    val bySec = sorted.groupBy(_.tsSec).toSeq.sortBy(_._1).map(_._2)
    val batches = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[TransEv])
    bySec.foreach { grp =>
      if (rnd.nextBoolean() && batches.last.nonEmpty)
        batches += scala.collection.mutable.ArrayBuffer.empty[TransEv]
      batches.last ++= grp
    }
    batches.map(b => rnd.shuffle(b.toSeq)).toSeq
  }

  test("funnel advance over any second-aligned batching ≡ brute funnel") {
    for (trial <- 1 to 300) {
      val evs = randomHistory(1 + rnd.nextInt(20))
      val batches = secondAlignedBatches(evs)
      var st = FunnelSt(-1L, -1L, -1L)
      val emitted = scala.collection.mutable.ArrayBuffer.empty[String]
      batches.foreach { b =>
        val (s1, out) = FunnelProcessor.advance(st, b)
        st = s1; emitted ++= out
      }
      val (tv, tc, tp) = bruteFunnel(evs)
      assert((st.tv, st.tc, st.tp) == ((tv, tc, tp)),
        s"trial $trial: state ${(st.tv, st.tc, st.tp)} != brute " +
          s"${(tv, tc, tp)} for $evs split $batches")
      assert(emitted.count(_ == "viewed") == (if (tv >= 0) 1 else 0))
      assert(emitted.count(_ == "clicked") == (if (tc >= 0) 1 else 0))
      assert(emitted.count(_ == "purchased") == (if (tp >= 0) 1 else 0))
    }
  }

  test("transition advance over any order-preserving batching ≡ chain") {
    for (trial <- 1 to 300) {
      val evs = randomHistory(1 + rnd.nextInt(20))
      val sorted = evs.sortBy(e => (e.tsSec, e.event_id))
      // Transitions only need (tsSec, id)-ORDERED batches — cut
      // anywhere, shuffle within.
      val cuts = (0 +: (1 until sorted.length)
        .filter(_ => rnd.nextBoolean())) :+ sorted.length
      val batches = cuts.distinct.sorted.sliding(2).map {
        case Seq(a, b) => rnd.shuffle(sorted.slice(a, b))
      }.toSeq
      var st: Option[LastEv] = None
      val pairs =
        scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      batches.foreach { b =>
        val (s1, out) = TransitionsProcessor.advance(st, b)
        st = s1; pairs ++= out
      }
      val expected = sorted.map(_.event_type)
        .sliding(2).filter(_.length == 2)
        .map { case Seq(a, b) => (a, b) }.toSeq
      assert(pairs.toSeq == expected,
        s"trial $trial: $pairs != $expected for $evs")
      assert(st.map(_.event_id) == sorted.lastOption.map(_.event_id))
    }
  }

  /** CUSUM step under any ORDER-PRESERVING batching (cuts anywhere in
    * the (tsMicros, event_id) order, arbitrary shuffle WITHIN each
    * batch) must reproduce the one-shot run exactly: same emission
    * sequence, same final (S, seq) state, same alarm count — the
    * cross-batch state-threading contract the streaming gate relies
    * on, swept without streaming machinery.
    */
  test("cusum advance over any order-preserving batching ≡ one-shot") {
    for (trial <- 1 to 300) {
      val n = 1 + rnd.nextInt(40)
      var tus = 0L
      val evs = (1 to n).map { i =>
        tus += 1 + rnd.nextInt(1000)
        AnomEv(i.toLong, "k", tus,
          rnd.nextInt(20000).toLong - 2000L)
      }
      val (oneState, oneOut) =
        CusumStep.advance("k", (0L, 0L), evs)
      // Random order-preserving cuts, then shuffle within batches.
      val batches = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[AnomEv])
      evs.foreach { e =>
        if (rnd.nextBoolean() && batches.last.nonEmpty)
          batches += scala.collection.mutable.ArrayBuffer.empty[AnomEv]
        batches.last += e
      }
      var st = (0L, 0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[CusumOut]
      batches.foreach { b =>
        val (s1, o) = CusumStep.advance("k", st, rnd.shuffle(b.toSeq))
        st = s1; out ++= o
      }
      assert(st == oneState,
        s"trial $trial: state $st != $oneState")
      assert(out.toSeq == oneOut,
        s"trial $trial: emissions diverged at batching $batches")
      assert(out.count(_.alarm) == oneOut.count(_.alarm))
    }
  }
}
