package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions._

/** Unigram-LM (SentencePiece-style) subword tokenizer — completes the
  * tokenizer trio beside the BPE trainer/applier and the WordPiece
  * vocab (`bpe_*`, `wordpiece_*`): instead of greedy merge rules, each
  * word is segmented by a VITERBI DP that minimizes the total
  * surprisal of its pieces under a corpus-trained piece-frequency
  * model (Kudo, "Subword Regularization", ACL'18 — the inference
  * path; training here is a single count pass rather than EM, the
  * standard frequency-initialized vocabulary).
  *
  * Cross-engine exactness: the repo convention is integer sufficient
  * statistics (see `bigram_lm_score` — "no libm"), so piece surprisal
  * is quantized to 1/16-bit units computed ENTIRELY in integer math:
  * q16(n) = 16·floor(log2 n) + T[mantissa], with floor(log2 n) =
  * length(bin(n))-1, the mantissa the value's top five bits, and T a
  * fixed 16-entry lookup table — every step exact in both Spark
  * (length/bin/shiftright) and DuckDB (length/bin/>>), so the DP
  * compares identical integers in both engines and no double `ln`
  * rounding can flip an argmax. cost(piece) = q16(Σ vocab counts) −
  * q16(cnt piece) ≈ 16·log2(1/p) — surprisal in sixteenth-bits.
  *
  * The DP state is one BIGINT key = cost·2^20 + n_pieces, so
  * lexicographic (min cost, then fewest pieces) is plain integer
  * `least` — deterministic even when distinct paths tie on cost.
  * Spark runs the DP as an `aggregate` higher-order function over
  * word positions (pure codegen expression, no UDF); the oracle runs
  * the identical recurrence as a recursive CTE carrying the last four
  * DP cells.
  *
  * Scale design: the vocabulary build is one corpus scan with
  * map-side-combinable counts; the DP runs per DISTINCT word
  * (vocabulary-sized — Heaps-law sublinear in corpus size) and joins
  * back to the token stream by word, so the corpus-sized work is two
  * scans and one key-equi join. The collected vocabulary (≤40 pieces
  * + alphabet) is the bounded driver-side trainer artifact, same
  * contract as the BPE merge table.
  */
object UnigramQueries {

  /** Top-N multi-character pieces kept in the vocabulary; every
    * single character in the corpus is always kept so any word
    * segments.
    */
  private val V = 40

  /** DP key encoding: key = cost · 2^20 + n_pieces. */
  private val Enc = 1L << 20

  /** T[m-16] = floor(16·(log2 m − 4)) for the 5-bit mantissa
    * m ∈ [16, 31] — fixed constants, identical literals both sides.
    */
  private val T = Array(0L, 1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 12, 13, 14, 15)

  /** q16(n) = 16·floor(log2 n) + T[mantissa] — integer-exact
    * sixteenth-bit log2, driver-side twin of the SQL expressions
    * below (used when building the broadcast cost map).
    */
  private[graft] def q16(n: Long): Long = {
    require(n >= 1)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val m = if (e >= 4) n >> (e - 4) else n << (4 - e)
    16L * e + T((m - 16).toInt)
  }

  /** Spark SQL expression for q16 over bigint expression `x`. */
  private def q16SparkSql(x: String): String =
    s"CAST(16*(length(bin($x))-1) + element_at(" +
      s"array(0,1,2,3,5,6,7,8,9,10,11,12,12,13,14,15), " +
      s"CAST((CASE WHEN length(bin($x)) >= 5 " +
      s"THEN shiftright($x, length(bin($x))-5) " +
      s"ELSE shiftleft($x, 5-length(bin($x))) END) AS INT) - 15) AS BIGINT)"

  /** DuckDB SQL expression for q16 over bigint expression `x`. */
  private def q16DuckSql(x: String): String =
    s"CAST(16*(length(bin($x))-1) + " +
      s"[0,1,2,3,5,6,7,8,9,10,11,12,12,13,14,15]" +
      s"[CAST((CASE WHEN length(bin($x)) >= 5 " +
      s"THEN $x >> (length(bin($x))-5) " +
      s"ELSE $x << (5-length(bin($x))) END) AS INT) - 15] AS BIGINT)"

  /** Distinct words with occurrence counts (instance-weighted). */
  private def wordCounts(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))

  /** Vocabulary: top-V multi-char substrings (length 2–4) of words by
    * type-weighted count, plus every single character. (piece, cnt).
    */
  private def vocabDf(s: SparkSession, d: String): DataFrame = {
    val subArrays = (1 to 4).map(l =>
      when(length(col("w")) >= l,
        transform(sequence(lit(1), length(col("w")) - (l - 1)),
          p => col("w").substr(p, lit(l))))
        .otherwise(array().cast("array<string>")))
    val pieces = wordCounts(s, d)
      .select(col("cnt"), explode(flatten(array(subArrays: _*))).as("piece"))
      .groupBy("piece")
      .agg(sum(col("cnt")).as("cnt"))
    val multi = pieces.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(V)
    multi.unionByName(pieces.filter(length(col("piece")) === 1))
  }

  /** Bounded trainer artifact: collected (piece → surprisal cost),
    * memoized per (session, dir) like the BPE merge table.
    */
  private val costsMemo = new SessionMemo[Map[String, Long]]
  private def vocabCosts(s: SparkSession, d: String): Map[String, Long] =
    costsMemo.getOrCompute(s, d) {
      val v = vocabDf(s, d).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      val qt = q16(v.map(_._2).sum)
      v.map { case (p, c) => p -> (qt - q16(c)) }.toMap
    }

  /** Viterbi DP over one word column: returns the encoded key column
    * (cost·2^20 + n_pieces of the optimal segmentation). acc[j] holds
    * the best key at character position j−1; a length-l piece ending
    * at position i extends acc[i−l+1] — same index expression for the
    * array slot and the piece start, both 1-based.
    */
  private[graft] def viterbiKey(w: Column, costs: Map[String, Long]): Column = {
    val cm = typedLit(costs)
    aggregate(
      sequence(lit(1), length(w)),
      array(lit(0L)),
      (acc, i) =>
        concat(acc, array(least(
          (1 to 4).map { l =>
            when(i >= l,
              element_at(acc, i - (l - 1)) +
                element_at(cm, w.substr(i - (l - 1), lit(l))) * lit(Enc) +
                lit(1L))
          }: _*))),
      acc => element_at(acc, -1))
  }

  /** Shared oracle CTE chain: word counts → piece counts → vocabulary
    * with integer surprisal costs (`vc(piece, cnt, cost)`).
    */
  private val vocabCte =
    s"""wd AS (
       |  SELECT w, count(*) AS cnt FROM (
       |    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
       |    FROM documents) z
       |  WHERE length(w) >= 1 GROUP BY w),
       |pieces AS (
       |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
       |    SELECT substr(w, pp.p, ll.l) AS piece, cnt
       |    FROM wd,
       |         LATERAL unnest([1, 2, 3, 4]) AS ll(l),
       |         LATERAL unnest(generate_series(1, length(w) - ll.l + 1))
       |           AS pp(p)
       |  ) sub GROUP BY piece),
       |vocab AS (
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt FROM pieces WHERE length(piece) >= 2
       |    ORDER BY cnt DESC, piece ASC LIMIT $V) m
       |  UNION ALL
       |  SELECT piece, cnt FROM pieces WHERE length(piece) = 1),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
       |vc AS (
       |  SELECT piece, cnt,
       |         ${q16DuckSql("total")} - ${q16DuckSql("cnt")} AS cost
       |  FROM vocab, tot)""".stripMargin

  /** Oracle recursive-CTE Viterbi over word table `src(w, cnt)`: dp
    * carries the last four DP cells (k0 = best at pos … k3 = best at
    * pos−3); the candidate for a length-l piece ending at pos+1
    * extends k(l−1). Emits `seg(w, cnt, n_pieces, cost)`.
    */
  private def dpCte(src: String) =
    s"""dp AS (
       |  SELECT w, cnt, 0 AS pos, CAST(0 AS BIGINT) AS k0,
       |         CAST(NULL AS BIGINT) AS k1, CAST(NULL AS BIGINT) AS k2,
       |         CAST(NULL AS BIGINT) AS k3
       |  FROM $src
       |  UNION ALL
       |  SELECT dp.w, dp.cnt, pos + 1,
       |         least(
       |           k0 + v1.cost * $Enc + 1,
       |           k1 + v2.cost * $Enc + 1,
       |           k2 + v3.cost * $Enc + 1,
       |           k3 + v4.cost * $Enc + 1),
       |         k0, k1, k2
       |  FROM dp
       |  LEFT JOIN vc v1 ON v1.piece = substr(w, pos + 1, 1)
       |  LEFT JOIN vc v2 ON pos >= 1 AND v2.piece = substr(w, pos, 2)
       |  LEFT JOIN vc v3 ON pos >= 2 AND v3.piece = substr(w, pos - 1, 3)
       |  LEFT JOIN vc v4 ON pos >= 3 AND v4.piece = substr(w, pos - 2, 4)
       |  WHERE pos < length(w)),
       |seg AS (
       |  SELECT w, cnt, CAST(k0 % $Enc AS BIGINT) AS n_pieces,
       |         CAST(k0 // $Enc AS BIGINT) AS cost
       |  FROM dp WHERE pos = length(w))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The trained vocabulary with integer surprisal costs — computed
    // fully in-engine (the q16 expression over the counts), pinned
    // against the oracle's identical integer arithmetic.
    "unigram_vocab" -> ((s, d) => {
      val v = vocabDf(s, d)
      val tot = v.agg(sum(col("cnt")).as("total"))
      v.crossJoin(broadcast(tot)) // ONE-ROW normalizer
        .select(col("piece"), col("cnt"),
          (expr(q16SparkSql("total")) - expr(q16SparkSql("cnt")))
            .as("cost"))
        .orderBy(col("cnt").desc, col("piece").asc)
    }),

    // Viterbi segmentation of the most frequent words: optimal piece
    // count and total surprisal per word under the trained vocab.
    "unigram_segment" -> ((s, d) => {
      val costs = vocabCosts(s, d)
      wordCounts(s, d)
        .orderBy(col("cnt").desc, col("w").asc)
        .limit(200)
        .withColumn("key", viterbiKey(col("w"), costs))
        .select(col("w"), col("cnt"),
          (col("key") % Enc).as("n_pieces"),
          expr(s"CAST(key DIV $Enc AS BIGINT)").as("cost"))
        .orderBy(col("cnt").desc, col("w").asc)
    }),

    // Per-document token-distribution ENTROPY in the same integer
    // sixteenth-bit units: H_q16 = Σ_tokens c·(q16(N) − q16(c)) —
    // exactly N·H(p) quantized, the repetition/diversity score a
    // quality filter thresholds on, computed with zero libm. One
    // corpus scan, per-doc aggregation; the q16 expressions are the
    // shared quantizer the oracle rebuilds bit-identically.
    "token_entropy_q16" -> ((s, d) => {
      val tk = documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .filter(length(col("w")) >= 1)
      val cnts = tk.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      val tot = tk.groupBy("doc_id").agg(count(lit(1)).as("n"))
      cnts.join(tot, "doc_id")
        .select(col("doc_id"), col("n"), col("c"),
          (expr(q16SparkSql("n")) - expr(q16SparkSql("c"))).as("s"))
        .groupBy("doc_id")
        .agg(
          max(col("n")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          sum(col("c") * col("s")).as("entropy_q16"))
        .withColumn("bits_per_token",
          col("entropy_q16").cast("double") / lit(16.0)
            / col("n_tokens").cast("double"))
        .orderBy("doc_id")
    }),

    // Per-document subword token counts: the DP runs once per
    // DISTINCT word and joins back to the token stream — the
    // vocabulary-sized-compute / corpus-sized-scan split a 100 TB
    // tokenization pass needs.
    "unigram_token_count" -> ((s, d) => {
      val costs = vocabCosts(s, d)
      val seg = wordCounts(s, d)
        .withColumn("key", viterbiKey(col("w"), costs))
        .select(col("w"),
          (col("key") % Enc).as("n_pieces"),
          expr(s"CAST(key DIV $Enc AS BIGINT)").as("cost"))
      documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .filter(length(col("w")) >= 1)
        .join(seg, Seq("w"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_words"),
          sum(col("n_pieces")).as("n_subwords"),
          sum(col("cost")).as("surprisal_q16"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "unigram_vocab" ->
      s"""WITH $vocabCte
         |SELECT piece, cnt, cost FROM vc
         |ORDER BY cnt DESC, piece ASC""".stripMargin,
    "unigram_segment" ->
      s"""WITH RECURSIVE $vocabCte,
         |wtop AS (
         |  SELECT w, cnt FROM wd ORDER BY cnt DESC, w ASC LIMIT 200),
         |${dpCte("wtop")}
         |SELECT w, cnt, n_pieces, cost FROM seg
         |ORDER BY cnt DESC, w ASC""".stripMargin,
    "token_entropy_q16" ->
      s"""WITH tk AS (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id,
         |           unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
         |    FROM documents) z
         |  WHERE length(w) >= 1),
         |cnts AS (SELECT doc_id, w, count(*) AS c FROM tk
         |         GROUP BY doc_id, w),
         |tot AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY doc_id),
         |j AS (
         |  SELECT c.doc_id, t.n, c.c,
         |         ${q16DuckSql("n")} - ${q16DuckSql("c")} AS s
         |  FROM cnts c JOIN tot t USING (doc_id)),
         |g AS (
         |  SELECT doc_id, max(n) AS n_tokens, count(*) AS n_distinct,
         |         CAST(sum(c * s) AS BIGINT) AS entropy_q16
         |  FROM j GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_distinct, entropy_q16,
         |       CAST(entropy_q16 AS DOUBLE) / 16.0
         |         / CAST(n_tokens AS DOUBLE) AS bits_per_token
         |FROM g ORDER BY doc_id""".stripMargin,
    "unigram_token_count" ->
      s"""WITH RECURSIVE $vocabCte,
         |${dpCte("wd")},
         |docw AS (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id,
         |           unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
         |    FROM documents) z
         |  WHERE length(w) >= 1)
         |SELECT doc_id, count(*) AS n_words,
         |       CAST(sum(n_pieces) AS BIGINT) AS n_subwords,
         |       CAST(sum(cost) AS BIGINT) AS surprisal_q16
         |FROM docw JOIN seg USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
