package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over Array[Float] columns, built from
  * higher-order functions (`zip_with` + `aggregate`) so they stay
  * declarative — no UDF, no driver-side math.
  *
  * Determinism note (this is what makes the DuckDB oracle exact): the
  * fold accumulates left-to-right in DOUBLE, and DuckDB's
  * unnest-then-SUM over the same values accumulates in the same order —
  * verified bit-identical. Never swap in a parallel/pairwise reduction
  * here without also changing the oracle.
  */
object Vectors {

  /** Dot product of two float-array columns, as a double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane weight for LSH: plane p,
    * dimension i → integer in [-9, 9]. Same formula is inlined in the
    * oracle SQL.
    */
  def planeWeight(p: Int, i: Column): Column =
    (lit(p) * 73 + i * 37) % 19 - 9

  /** Signed projection of an embedding onto deterministic hyperplane p
    * (only the SIGN is consumed for bucketing, so double rounding can
    * never flip a bucket in practice).
    */
  def planeDot(emb: Column, p: Int): Column =
    aggregate(
      zip_with(
        emb,
        sequence(lit(0), size(emb) - 1),
        (x, i) => x.cast("double") * planeWeight(p, i).cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** LSH bucket id from `nPlanes` sign bits. */
  def lshBucket(emb: Column, nPlanes: Int): Column =
    lshBucketAt(emb, nPlanes, 0)

  /** LSH bucket from `nPlanes` sign bits starting at global plane
    * `offset` — table t of a multi-table LSH index uses
    * offset = t * nPlanes, so every table draws a disjoint slice of
    * the deterministic plane family.
    */
  def lshBucketAt(emb: Column, nPlanes: Int, offset: Int): Column =
    (0 until nPlanes)
      .map(j =>
        when(planeDot(emb, offset + j) > 0, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)
}
