package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions._

/** Training-data preparation operators: supervised feature selection
  * (chi-square token↔language association), the feature-hashing trick,
  * and deterministic T5-style span-corruption masking. The reference
  * has none of this (its "features" are three hand-repaired title
  * lists); a 100 TB curation pipeline runs all three daily — picking
  * classifier features, embedding documents without a vocabulary
  * table, and generating denoising training pairs.
  *
  * Scale design notes per operator sit on the queries; the common
  * theme is that NONE of them materialize a vocabulary-sized driver
  * structure: chi2 joins token frames on the token key (vocabulary-
  * partitioned shuffle), the hashing trick replaces the vocab lookup
  * with arithmetic, and span corruption is windowed per-document
  * (partition key = doc_id, bounded state per key).
  *
  * Determinism: selection is driven by [[hash60]] (md5-based, engine-
  * independent), counts are exact longs, and the single chi2 division
  * is one IEEE double op from exact integer operands — bit-identical
  * cross-engine.
  */
object FeatureQueries {

  /** Feature-hash dimensionality (buckets). */
  private val HashDim = 64

  /** Mask rate for span corruption: positions with h % MaskMod == 0
    * start/extend masked runs (≈ 1/MaskMod of tokens masked).
    */
  private val MaskMod = 5

  /** Per-doc token stream with 0-based positions, empty tokens
    * dropped (the tokens() of a blank text is a single "" element).
    */
  private def posToks(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](

    // CHI-SQUARE token↔language association — the classic feature-
    // selection statistic for a quality/language classifier: for each
    // (token, lang), the 2×2 document-frequency contingency
    //   a = docs of lang containing tok     b = other docs containing
    //   c = docs of lang without tok        d = other docs without
    // chi2 = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)); numerator and
    // denominator stay exact BIGINTs (≤ ~3e18 at sf0.1), the one
    // double division is IEEE-identical cross-engine. Top-5 tokens
    // per language, df ≥ 5 to drop one-off noise.
    //
    // Scale: the doc-frequency frames aggregate with map-side combine
    // and join on the TOKEN key (vocabulary-sized shuffle, never a
    // driver vocab); the per-language doc counts are a bounded
    // broadcast; top-5 per lang is a windowed rank over the
    // vocabulary, partitioned by the 5 languages.
    "token_chi2" -> ((s, d) => {
      val dt = posToks(s, d)
        .select("doc_id", "lang", "tok").distinct()
      val tfl = dt.groupBy("tok", "lang")
        .agg(count(lit(1)).as("a"))
      val tf = dt.groupBy("tok")
        .agg(count(lit(1)).as("df"))
      val nl = documents(s, d).groupBy("lang")
        .agg(count(lit(1)).as("n_l"))
      val nn = documents(s, d).agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("lang")
        .orderBy(col("chi2").desc, col("tok").asc)
      tfl
        .join(tf, Seq("tok"))
        .join(broadcast(nl), Seq("lang"))
        .crossJoin(broadcast(nn))
        .filter(col("df") >= 5)
        .withColumn("b", col("df") - col("a"))
        .withColumn("c", col("n_l") - col("a"))
        .withColumn("dd", col("n_docs") - col("n_l") - col("b"))
        .withColumn("num",
          col("n_docs") *
            (col("a") * col("dd") - col("b") * col("c")) *
            (col("a") * col("dd") - col("b") * col("c")))
        .withColumn("den",
          (col("a") + col("b")) * (col("c") + col("dd")) *
            (col("a") + col("c")) * (col("b") + col("dd")))
        .withColumn("chi2",
          col("num").cast("double") / col("den").cast("double"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("lang", "tok", "a", "df", "chi2", "rnk")
        .orderBy("lang", "rnk")
    }),

    // FEATURE HASHING (the hashing trick): signed hashed bag-of-words
    // at HashDim buckets — bucket = h(tok) mod D, sign = parity of an
    // independent hash, value = signed occurrence count. No
    // vocabulary table anywhere (that is the point: at 100 TB the
    // vocab join/broadcast disappears entirely — embedding a document
    // is explode + arithmetic + one hash-aggregate with map-side
    // combine on the (doc, bucket) key).
    "feature_hash" -> ((s, d) =>
      posToks(s, d)
        .withColumn("bucket",
          (hash60(col("tok")) % HashDim).cast("int"))
        .withColumn("sgn",
          when(hash60(concat(lit("s:"), col("tok"))) % 2 === 0, 1L)
            .otherwise(-1L))
        .groupBy("doc_id", "bucket")
        .agg(sum(col("sgn")).as("v"))
        .filter(col("v") =!= 0)
        .orderBy("doc_id", "bucket")),

    // EXACT AUC (Mann–Whitney rank-sum with midranks) of a candidate
    // quality signal — here n_chars separating English from
    // non-English docs: the eval a curation pipeline runs before
    // trusting any heuristic score as a filter. Entirely integer:
    // group by DISTINCT score value (the only row-scale shuffle, with
    // map-side combine), then the tie-aware rank-sum folds over the
    // aggregated score frame via one ordered prefix-sum —
    //   S2 = Σ_s p_s·(2·C_s + c_s + 1),  2U = S2 − n_pos·(n_pos+1),
    //   auc_ppm = 10⁶·2U DIV (2·n_pos·n_neg)
    // (validated: ties contribute ½ via the midrank term). The
    // unpartitioned window runs over the DISTINCT-SCORE frame, not
    // rows — the equal-frequency-binning scale contract; were score
    // cardinality itself row-scale, the prefix-sum would move to the
    // GlobalRank range scheme.
    "auc_quality" -> ((s, d) => {
      val g = documents(s, d)
        .groupBy(col("n_chars").as("score"))
        .agg(
          count(lit(1)).as("c"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("p"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("cum", coalesce(sum(col("c")).over(w), lit(0L)))
        .agg(
          sum(col("p")).as("n_pos"),
          (sum(col("c")) - sum(col("p"))).as("n_neg"),
          sum(col("p") * (lit(2) * col("cum") + col("c") + lit(1)))
            .as("s2"))
        .withColumn("u2",
          col("s2") - col("n_pos") * (col("n_pos") + 1))
        .withColumn("auc_ppm",
          expr("1000000 * u2 DIV (2 * n_pos * n_neg)"))
        .select("n_pos", "n_neg", "u2", "auc_ppm")
    }),

    // PRECISION/RECALL CURVE for the same signal, at ten exact
    // volume-decile thresholds: decile i's threshold is the highest
    // score t where "keep if score ≥ t" keeps at least i·N/10 rows.
    // Same scale shape as auc_quality: cumulative sums run over the
    // DISTINCT-SCORE frame (descending), and the decile selection is
    // a 10-row broadcast joined on cum_prev < target ≤ cum — one row
    // can serve several deciles when a heavy score value straddles
    // them. All counts exact; the two ratios are integer ppm.
    "pr_curve" -> ((s, d) => {
      val g = documents(s, d)
        .groupBy(col("n_chars").as("score"))
        .agg(
          count(lit(1)).as("c"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("p"))
      val wd = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = g
        .withColumn("cumc", sum(col("c")).over(wd))
        .withColumn("cump", sum(col("p")).over(wd))
        .withColumn("cum_prev", col("cumc") - col("c"))
      val tot = documents(s, d)
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("lang") === "en", 1L).otherwise(0L))
            .as("n_pos"))
      val deciles = tot
        .select(col("n_docs"), col("n_pos"),
          explode(sequence(lit(1), lit(10))).as("decile"))
        .withColumn("target", expr("decile * n_docs DIV 10"))
      broadcast(deciles)
        .join(cum,
          col("cum_prev") < col("target") &&
            col("target") <= col("cumc"))
        .withColumn("tp", col("cump"))
        .withColumn("fp", col("cumc") - col("cump"))
        .withColumn("fn", col("n_pos") - col("cump"))
        .withColumn("prec_ppm", expr("1000000 * tp DIV cumc"))
        .withColumn("rec_ppm", expr("1000000 * tp DIV n_pos"))
        .select(col("decile"), col("score").as("threshold"),
          col("tp"), col("fp"), col("fn"),
          col("prec_ppm"), col("rec_ppm"))
        .orderBy("decile")
    }),

    // CALIBRATION (reliability diagram) of the same signal read as a
    // probability via its ECDF: p̂(doc) = 10⁶·cum_le(score) DIV N,
    // binned into ten equal-width probability bins, each reporting
    // mean predicted vs actual positive rate — the "is the score a
    // probability?" check that decides whether a quality signal can
    // gate by threshold or needs recalibration first. Same scale
    // shape as auc_quality: the ECDF prefix-sum and the binning run
    // entirely over the DISTINCT-SCORE frame; only the initial
    // group-by touches rows. All ratios exact integer ppm.
    "calibration_bins" -> ((s, d) => {
      val g = documents(s, d)
        .groupBy(col("n_chars").as("score"))
        .agg(
          count(lit(1)).as("c"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("p"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = documents(s, d).agg(count(lit(1)).as("n_docs"))
      g.withColumn("cum_le", sum(col("c")).over(w))
        .crossJoin(broadcast(tot))
        .withColumn("p_hat", expr("1000000 * cum_le DIV n_docs"))
        .withColumn("bin",
          least(expr("p_hat DIV 100000"), lit(9L)).cast("int"))
        .groupBy("bin")
        .agg(
          sum(col("c")).as("n"),
          sum(col("c") * col("p_hat")).as("pred_sum"),
          sum(col("p")).as("n_pos"))
        .withColumn("mean_pred_ppm", expr("pred_sum DIV n"))
        .withColumn("actual_ppm", expr("1000000 * n_pos DIV n"))
        .select("bin", "n", "mean_pred_ppm", "actual_ppm")
        .orderBy("bin")
    }),

    // T5-STYLE SPAN CORRUPTION: deterministically mask ≈1/MaskMod of
    // token positions (selection hash on (doc_id, pos) — reproducible
    // across runs, engines, partitionings), collapse masked runs into
    // numbered sentinels, and emit the (corrupted, target) training
    // pair per document. Runs-to-sentinels is the gaps-and-islands
    // window (pos − row_number over masked positions), sentinel
    // numbering is the island dense_rank — all per-doc windows, so
    // the 100 TB shape is one shuffle on doc_id with bounded per-doc
    // state, then two ordered listaggs.
    "span_corrupt" -> ((s, d) => {
      val pt = posToks(s, d)
        .withColumn("masked",
          hash60(concat(col("doc_id").cast("string"), lit(":"),
            col("pos").cast("string"))) % MaskMod === 0)
      val wDoc = Window.partitionBy("doc_id").orderBy("pos")
      val islands = pt.filter(col("masked"))
        .withColumn("grp",
          col("pos") - row_number().over(wDoc))
        .withColumn("k", dense_rank().over(
          Window.partitionBy("doc_id").orderBy("grp")))
      val spanTargets = islands
        .groupBy("doc_id", "k")
        .agg(
          min("pos").as("pos"),
          expr("concat('<extra_id_', k - 1, '> ', " +
            "listagg(tok, ' ') WITHIN GROUP (ORDER BY pos))")
            .as("piece"))
      val corruptRows = pt.filter(!col("masked"))
        .select("doc_id", "pos", "tok")
        .unionByName(spanTargets
          .select(col("doc_id"), col("pos"),
            concat(lit("<extra_id_"), col("k") - 1, lit(">"))
              .as("tok")))
      val corrupted = corruptRows.groupBy("doc_id")
        .agg(expr("listagg(tok, ' ') WITHIN GROUP (ORDER BY pos)")
          .as("corrupted"))
      val target = spanTargets.groupBy("doc_id")
        .agg(expr("listagg(piece, ' ') WITHIN GROUP (ORDER BY k)")
          .as("target"))
      val stats = pt.groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"))
      stats
        .join(corrupted, Seq("doc_id"), "left")
        .join(target, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"), col("n_masked"),
          coalesce(col("corrupted"), lit("")).as("corrupted"),
          coalesce(col("target"), lit("")).as("target"))
        .orderBy("doc_id")
    }))

  /** Shared oracle token stream: (doc_id, lang, pos, tok), 0-based
    * positions, blanks dropped — DuckDB's unnest-with-ordinality via
    * generate_subscripts-free list indexing.
    */
  private val posToksCte =
    s"""ptoks AS MATERIALIZED (
       |  SELECT doc_id, lang, k - 1 AS pos, t[k] AS tok
       |  FROM (SELECT doc_id, lang, $toksSqlF AS t FROM documents) d
       |  CROSS JOIN LATERAL (
       |    SELECT unnest(generate_series(1, len(d.t))) AS k) s
       |  WHERE length(t[k]) > 0)""".stripMargin

  private def toksSqlF = "regexp_split_to_array(trim(text), '\\s+')"

  val oracleSql: Map[String, String] = Map(
    "token_chi2" ->
      s"""WITH $posToksCte,
         |dt AS (SELECT DISTINCT doc_id, lang, tok FROM ptoks),
         |tfl AS (SELECT tok, lang, count(*) AS a
         |        FROM dt GROUP BY 1, 2),
         |tf AS (SELECT tok, count(*) AS df FROM dt GROUP BY 1),
         |nl AS (SELECT lang, count(*) AS n_l
         |       FROM documents GROUP BY 1),
         |nn AS (SELECT count(*) AS n_docs FROM documents),
         |cells AS (
         |  SELECT f.lang, f.tok, f.a, t.df,
         |         t.df - f.a AS b, l.n_l - f.a AS c,
         |         n.n_docs - l.n_l - (t.df - f.a) AS dd,
         |         n.n_docs AS n_docs
         |  FROM tfl f
         |  JOIN tf t USING (tok)
         |  JOIN nl l USING (lang)
         |  CROSS JOIN nn n
         |  WHERE t.df >= 5),
         |scored AS (
         |  SELECT lang, tok, a, df,
         |         CAST(n_docs * (a*dd - b*c) * (a*dd - b*c) AS DOUBLE)
         |           / CAST((a+b) * (c+dd) * (a+c) * (b+dd) AS DOUBLE)
         |           AS chi2
         |  FROM cells)
         |SELECT lang, tok, a, df, chi2, CAST(rnk AS INTEGER) AS rnk
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY lang
         |    ORDER BY chi2 DESC, tok ASC) AS rnk
         |  FROM scored) t
         |WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin,
    "feature_hash" ->
      s"""WITH $posToksCte,
         |fh AS (
         |  SELECT doc_id,
         |         CAST(${hash60Sql("tok")} % $HashDim AS INTEGER)
         |           AS bucket,
         |         CASE WHEN ${hash60Sql("'s:' || tok")} % 2 = 0
         |              THEN 1 ELSE -1 END AS sgn
         |  FROM ptoks)
         |SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS v
         |FROM fh GROUP BY 1, 2
         |HAVING sum(sgn) <> 0
         |ORDER BY doc_id, bucket""".stripMargin,
    "auc_quality" ->
      """WITH g AS (
        |  SELECT n_chars AS score, count(*) AS c,
        |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS p
        |  FROM documents GROUP BY 1
        |), cumg AS (
        |  SELECT score, c, p,
        |         coalesce(sum(c) OVER (ORDER BY score
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) AS cum
        |  FROM g
        |), tot AS (
        |  SELECT CAST(sum(p) AS BIGINT) AS n_pos,
        |         CAST(sum(c) - sum(p) AS BIGINT) AS n_neg,
        |         CAST(sum(p * (2 * cum + c + 1)) AS BIGINT) AS s2
        |  FROM cumg
        |)
        |SELECT n_pos, n_neg,
        |       s2 - n_pos * (n_pos + 1) AS u2,
        |       CAST(1000000 * (s2 - n_pos * (n_pos + 1))
        |         // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm
        |FROM tot""".stripMargin,
    "pr_curve" ->
      """WITH g AS (
        |  SELECT n_chars AS score, count(*) AS c,
        |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS p
        |  FROM documents GROUP BY 1
        |), cum AS (
        |  SELECT score, c, p,
        |         CAST(sum(c) OVER (ORDER BY score DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cumc,
        |         CAST(sum(p) OVER (ORDER BY score DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cump
        |  FROM g
        |), tot AS (
        |  SELECT count(*) AS n_docs,
        |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_pos
        |  FROM documents
        |), dec AS (
        |  SELECT i AS decile, (i * n_docs) // 10 AS target,
        |         n_docs, n_pos
        |  FROM tot, LATERAL unnest(generate_series(1, 10)) AS u(i)
        |)
        |SELECT CAST(d.decile AS INTEGER) AS decile,
        |       c.score AS threshold,
        |       CAST(c.cump AS BIGINT) AS tp,
        |       CAST(c.cumc - c.cump AS BIGINT) AS fp,
        |       CAST(d.n_pos - c.cump AS BIGINT) AS fn,
        |       CAST(1000000 * c.cump // c.cumc AS BIGINT) AS prec_ppm,
        |       CAST(1000000 * c.cump // d.n_pos AS BIGINT) AS rec_ppm
        |FROM dec d JOIN cum c
        |  ON c.cumc - c.c < d.target AND d.target <= c.cumc
        |ORDER BY decile""".stripMargin,
    "calibration_bins" ->
      """WITH g AS (
        |  SELECT n_chars AS score, count(*) AS c,
        |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS p
        |  FROM documents GROUP BY 1
        |), tot AS (SELECT count(*) AS n_docs FROM documents),
        |e AS (
        |  SELECT score, c, p,
        |         CAST(1000000 * (sum(c) OVER (ORDER BY score
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |           // t.n_docs AS BIGINT) AS p_hat
        |  FROM g CROSS JOIN tot t
        |), b AS (
        |  SELECT CAST(least(p_hat // 100000, 9) AS INT) AS bin,
        |         CAST(sum(c) AS BIGINT) AS n,
        |         CAST(sum(c * p_hat) AS BIGINT) AS pred_sum,
        |         CAST(sum(p) AS BIGINT) AS n_pos
        |  FROM e GROUP BY 1
        |)
        |SELECT bin, n,
        |       CAST(pred_sum // n AS BIGINT) AS mean_pred_ppm,
        |       CAST(1000000 * n_pos // n AS BIGINT) AS actual_ppm
        |FROM b ORDER BY bin""".stripMargin,
    "span_corrupt" ->
      s"""WITH $posToksCte,
         |pt AS MATERIALIZED (
         |  SELECT doc_id, pos, tok,
         |         ${hash60Sql(
               "CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)")}
         |           % $MaskMod = 0 AS masked
         |  FROM ptoks),
         |isl AS (
         |  SELECT doc_id, pos, tok,
         |         pos - row_number() OVER (PARTITION BY doc_id
         |           ORDER BY pos) AS grp
         |  FROM pt WHERE masked),
         |isl2 AS MATERIALIZED (
         |  SELECT doc_id, pos, tok,
         |         dense_rank() OVER (PARTITION BY doc_id
         |           ORDER BY grp) AS k
         |  FROM isl),
         |spans AS MATERIALIZED (
         |  SELECT doc_id, k, min(pos) AS pos,
         |         '<extra_id_' || (k - 1) || '> ' ||
         |           string_agg(tok, ' ' ORDER BY pos) AS piece
         |  FROM isl2 GROUP BY doc_id, k),
         |crows AS (
         |  SELECT doc_id, pos, tok FROM pt WHERE NOT masked
         |  UNION ALL
         |  SELECT doc_id, pos, '<extra_id_' || (k - 1) || '>' AS tok
         |  FROM spans),
         |corrupted AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos)
         |    AS corrupted
         |  FROM crows GROUP BY doc_id),
         |tgt AS (
         |  SELECT doc_id, string_agg(piece, ' ' ORDER BY k) AS target
         |  FROM spans GROUP BY doc_id),
         |stats AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |         CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_masked
         |  FROM pt GROUP BY doc_id)
         |SELECT s.doc_id, s.n_tokens, s.n_masked,
         |       coalesce(c.corrupted, '') AS corrupted,
         |       coalesce(t.target, '') AS target
         |FROM stats s
         |LEFT JOIN corrupted c USING (doc_id)
         |LEFT JOIN tgt t USING (doc_id)
         |ORDER BY s.doc_id""".stripMargin)
}
