package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` building an 8-slot MinHash signature from 60-bit
  * token hashes — the sketch-merge surface of SURVEY.md §7.3: zero is
  * the partial signature, reduce folds one hash into all slots,
  * merge takes elementwise mins, so partial aggregation (map-side
  * combine) is exact and the sketch merges associatively across any
  * partitioning — the property that makes it a 100 TB operator.
  *
  * Produces the same signatures as the expression-level
  * min(minhashSlot(h, i)) aggregation in TextQueries (oracle-pinned via
  * minhash_agg_typed sharing the minhash_signatures semantics).
  */
object MinHashAggregator
    extends Aggregator[Long, Array[Long], Array[Long]] {

  private val K = TextFunctionsConstants.K

  override def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < K) {
      val v = (TextFunctions.MinhashA(i) * (h % TextFunctions.MinhashP) +
        TextFunctions.MinhashB(i)) % TextFunctions.MinhashP
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < K) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

private object TextFunctionsConstants {
  val K = 8
}
