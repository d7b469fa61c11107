package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Typed `Aggregator` maintaining a Misra-Gries heavy-hitters summary —
  * the second mergeable-sketch surface beside [[MinHashAggregator]]:
  * each partition reduces its rows into a ≤K-counter summary, and
  * summaries MERGE associatively (combine counts, then subtract the
  * (K+1)-th largest and drop non-positives — Agarwal et al.,
  * "Mergeable Summaries"), so only O(K) state ever crosses the wire
  * regardless of corpus size.
  *
  * Guarantee used by the `heavy_hitters` query: per-item undercount is
  * at most n/(K+1), so every item with true frequency > n/(K+1) is
  * RETAINED in the final summary. The summary's counts (and even its
  * exact membership near the error floor) depend on merge order — so
  * the query treats it as a CANDIDATE set only, joins back for exact
  * counts, and filters on a threshold far above the error bound, which
  * makes the final output deterministic and cross-engine pinnable.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(
      buf: mutable.Map[String, Long],
      item: String): mutable.Map[String, Long] = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k => buf.update(item, 1L)
      case None =>
        // Decrement-all step: drop every counter by one, evict zeros.
        // Iterate a SNAPSHOT of the keys: mutating a mutable.Map mid-
        // iteration is contractually undefined even for value-only
        // updates (the encoder-deserialized buffer's concrete Map type
        // is an implementation detail).
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keys.toArray.foreach { key =>
          val c = buf(key) - 1
          if (c <= 0) dead += key else buf.update(key, c)
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(
      a: mutable.Map[String, Long],
      b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (item, c) =>
      a.update(item, a.getOrElse(item, 0L) + c)
    }
    if (a.size > k) {
      // Subtract the (k+1)-th largest count from all, evict ≤0 —
      // over a key snapshot, same reasoning as in reduce().
      val cut = a.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.keys.toArray.foreach { key =>
        val c = a(key) - cut
        if (c <= 0) dead += key else a.update(key, c)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def finish(buf: mutable.Map[String, Long]): Map[String, Long] =
    buf.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[mutable.Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Map[String, Long]]()
}
