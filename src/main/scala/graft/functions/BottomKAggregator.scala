package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` maintaining a KMV ("k minimum values" / bottom-k)
  * distinct sketch: the k smallest DISTINCT hash values seen so far,
  * kept as a sorted array — the third mergeable-sketch surface beside
  * [[MisraGriesAggregator]] (heavy hitters) and the engine's HLL/CMS
  * queries. Bounded O(k) state per group, associative merge (sorted
  * two-pointer union, dedupe, cap k), so only k longs ever cross the
  * wire regardless of corpus size — the map-side-combine shape a
  * 100 TB distinct-cardinality scan needs.
  *
  * Unlike HLL, a KMV sketch supports SET ALGEBRA after the fact: the
  * bottom-k of A ∪ B is computable from the two sketches alone, and
  * the fraction of the merged sketch present in both inputs estimates
  * Jaccard (Beyer et al., "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations", SIGMOD'07). The estimator the queries
  * use: with K_th the k-th smallest of a 60-bit hash space,
  * D̂ = (k-1) · 2^60 / K_th; when fewer than k distinct values exist
  * the sketch is exact and D̂ = |sketch|.
  *
  * DETERMINISM: the sketch is a pure function of the input's distinct
  * hash SET (insertion order and partitioning are irrelevant), so with
  * the engine's deterministic `hash60` the ORACLE REBUILDS THE
  * IDENTICAL SKETCH via a window row_number — the approximation itself
  * is hash-pinned cross-engine, not just bounded (same trick as the
  * `cms_estimate` sketch).
  */
class BottomKAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 1, s"KMV needs k > 1, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  /** Buffer invariant: sorted ascending, distinct, length ≤ k. */
  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, v)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) {
        // v displaces the current maximum; everything from ins shifts
        // right and the old k-th value falls off.
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf // v larger than the current k-th smallest
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (a(i) > b(j)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v } // equal: emit once
      out(n) = take
      n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
