package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline building blocks (tokenize / shingle / hash /
  * normalize), all as built-in expression compositions — codegen-
  * friendly, no UDFs, and each with an exact DuckDB-expressible twin so
  * the oracle can pin semantics.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Normalized dedup key: lowercase, collapse whitespace, trim. */
  def normText(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  /** Deterministic 60-bit hash: first 15 hex digits of md5, as a
    * non-negative long. Cross-engine: DuckDB computes the identical
    * value via CAST('0x' || substr(md5(s),1,15) AS BIGINT).
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL fragment for [[hash60]] over expression `e`. */
  def hash60Sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** Word n-gram shingles joined by single spaces; empty array when the
    * document has fewer than n tokens (guard needed because Spark's
    * `sequence(0, negative)` would generate a descending range).
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(
      size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** DuckDB SQL fragment for [[wordShingles]] over a token-list
    * expression `t`.
    */
  def wordShinglesSql(t: String, n: Int): String =
    s"list_transform(generate_series(1, len($t) - ${n - 1}), " +
      s"i -> array_to_string(list_slice($t, i, i + ${n - 1}), ' '))"

  /** MinHash parameters: h_i(x) = (a_i * (H mod p) + b_i) mod p over
    * the 60-bit shingle hash H. All arithmetic stays far below 2^63 so
    * Spark and DuckDB agree exactly.
    */
  val MinhashP = 2147483647L // 2^31 - 1
  val MinhashA: Seq[Long] = Seq(2, 3, 5, 7, 11, 13, 17, 19)
  val MinhashB: Seq[Long] =
    Seq(104729, 224737, 350377, 479909, 611953, 746773, 882377, 1020379)

  /** The i-th MinHash of a 60-bit hash column. */
  def minhashSlot(h: Column, i: Int): Column =
    (lit(MinhashA(i)) * (h % MinhashP) + MinhashB(i)) % MinhashP

  /** DuckDB SQL fragment for [[minhashSlot]]. */
  def minhashSlotSql(h: String, i: Int): String =
    s"(${MinhashA(i)} * ($h % $MinhashP) + ${MinhashB(i)}) % $MinhashP"
}
