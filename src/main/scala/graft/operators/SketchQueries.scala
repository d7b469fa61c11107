package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions._
import graft.functions.BottomKAggregator

/** KMV (bottom-k) distinct sketches — the sketch family member that
  * supports SET ALGEBRA: unlike HLL (`hll_union`) a KMV sketch of the
  * k smallest distinct hash values lets you estimate |A ∪ B|, Jaccard
  * and |A ∩ B| from the per-set sketches alone (Beyer et al.,
  * SIGMOD'07), which is exactly the "how much does source X overlap
  * source Y" question a corpus-curation pipeline asks before mixing.
  *
  * Scale design (the 100 TB shape):
  *   - the sketch is a mergeable typed Aggregator
  *     ([[BottomKAggregator]]): each partition reduces to ≤k sorted
  *     longs, merges are O(k) two-pointer unions, so per-source state
  *     crossing the wire is k·8 bytes no matter the corpus size;
  *   - pairwise set algebra happens on the ≤N_sources sketch rows
  *     (bounded aggregate output), never on the token table — the
  *     corpus is scanned once for the sketches and once for the exact
  *     baseline (which a production run would drop);
  *   - estimates use the engine's deterministic `hash60`, so the
  *     oracle REBUILDS THE IDENTICAL SKETCH via window row_number —
  *     the approximation itself is hash-pinned, like `cms_estimate`.
  */
object SketchQueries {

  private val K = 64

  /** 2^60 — the hash space size of `hash60`, exactly representable as
    * a double (and 63·2^60 still is), so Spark and DuckDB compute the
    * identical estimator constant.
    */
  private val Space: Double = math.pow(2, 60)

  /** Distinct (source, token-hash) pairs — the input multiset both
    * engines sketch. Hash collisions collapse identically in both.
    */
  private def sourceHashes(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("t"))
      .select(col("source"), hash60(col("t")).as("h"))
      .distinct()

  private val toksSql = "regexp_split_to_array(trim(text), '\\s+')"

  private val sourceHashesCte =
    s"""sh AS (
       |  SELECT DISTINCT source, ${hash60Sql("t")} AS h FROM (
       |    SELECT source, unnest($toksSql) AS t
       |    FROM documents) z
       |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-source distinct-token cardinality: exact vs KMV estimate.
    // The sketch rides one mergeable aggregation (bounded O(k) state);
    // when a source has fewer than k distinct hashes the sketch IS the
    // value set and the estimate is exact, otherwise
    // D̂ = (k-1)·2^60 / kth_hash. Standard error ~ 1/√(k-2) ≈ 13% at
    // k=64 — the property spec asserts the bound, the oracle pins the
    // exact arithmetic.
    "kmv_distinct" -> ((s, d) => {
      val bottomK = udaf(new BottomKAggregator(K))
      val hs = sourceHashes(s, d)
      val sk = hs.groupBy("source")
        .agg(bottomK(col("h")).as("sketch"), count(lit(1)).as("exact_d"))
      sk.select(
          col("source"),
          col("exact_d"),
          size(col("sketch")).cast("long").as("sketch_size"),
          element_at(col("sketch"), -1).as("kth_hash"),
          when(size(col("sketch")) < K, size(col("sketch")).cast("double"))
            .otherwise(lit((K - 1).toDouble * Space) /
              element_at(col("sketch"), -1).cast("double"))
            .as("est_d"))
        .withColumn("rel_err",
          (col("est_d") - col("exact_d").cast("double")) /
            col("exact_d").cast("double"))
        .orderBy("source")
    }),

    // Pairwise source overlap from sketches alone: the bottom-k of
    // A ∪ B is computable from the two k-arrays (sorted union, first
    // k), the fraction of that merged sketch present in BOTH inputs
    // estimates Jaccard, and est_inter = Ĵ · |A ∪ B|̂. The pair frame
    // is the ≤(N_sources choose 2) join of two bounded aggregate
    // outputs — a broadcast nested loop over constant-size sides, by
    // design; the token table is never pair-joined. The exact
    // intersection baseline is a key-equi self-join on the hash.
    "kmv_union_intersect" -> ((s, d) => {
      val bottomK = udaf(new BottomKAggregator(K))
      val hs = sourceHashes(s, d)
      val sk = hs.groupBy("source")
        .agg(bottomK(col("h")).as("sketch"), count(lit(1)).as("d"))
      val pairs = sk.as("a")
        .join(sk.as("b"), col("a.source") < col("b.source"))
        .select(
          col("a.source").as("src_a"), col("b.source").as("src_b"),
          col("a.sketch").as("ka"), col("b.sketch").as("kb"),
          col("a.d").as("da"), col("b.d").as("db"))
      val inter = hs.as("x")
        .join(hs.as("y"),
          col("x.h") === col("y.h") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("exact_inter"))
      pairs
        .join(inter, Seq("src_a", "src_b"), "left")
        .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
        .withColumn("merged",
          slice(array_sort(array_union(col("ka"), col("kb"))), 1, K))
        .withColumn("merged_size", size(col("merged")).cast("long"))
        .withColumn("kth_hash", element_at(col("merged"), -1))
        .withColumn("est_union",
          when(col("merged_size") < K, col("merged_size").cast("double"))
            .otherwise(
              lit((K - 1).toDouble * Space) / col("kth_hash").cast("double")))
        .withColumn("n_both",
          size(filter(col("merged"),
            v => array_contains(col("ka"), v) &&
              array_contains(col("kb"), v))).cast("long"))
        .withColumn("jaccard_est",
          col("n_both").cast("double") / col("merged_size").cast("double"))
        .withColumn("est_inter", col("jaccard_est") * col("est_union"))
        .select(
          col("src_a"), col("src_b"),
          (col("da") + col("db") - col("exact_inter")).as("exact_union"),
          col("exact_inter"), col("merged_size"), col("kth_hash"),
          col("est_union"), col("n_both"), col("jaccard_est"),
          col("est_inter"))
        .orderBy("src_a", "src_b")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "kmv_distinct" ->
      s"""WITH $sourceHashesCte,
         |rn AS (
         |  SELECT source, h,
         |         row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |  FROM sh),
         |sk AS (
         |  SELECT source, count(*) AS sketch_size, max(h) AS kth_hash
         |  FROM rn WHERE rn <= $K GROUP BY source),
         |ex AS (SELECT source, count(*) AS exact_d FROM sh GROUP BY source),
         |est AS (
         |  SELECT sk.source, ex.exact_d, sk.sketch_size, sk.kth_hash,
         |         CASE WHEN sk.sketch_size < $K
         |              THEN CAST(sk.sketch_size AS DOUBLE)
         |              ELSE ${K - 1}.0 * power(2.0, 60) /
         |                   CAST(sk.kth_hash AS DOUBLE) END AS est_d
         |  FROM sk JOIN ex ON sk.source = ex.source)
         |SELECT source, exact_d, sketch_size, kth_hash, est_d,
         |       (est_d - CAST(exact_d AS DOUBLE)) / CAST(exact_d AS DOUBLE)
         |         AS rel_err
         |FROM est ORDER BY source""".stripMargin,
    "kmv_union_intersect" ->
      s"""WITH $sourceHashesCte,
         |rn AS (
         |  SELECT source, h,
         |         row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |  FROM sh),
         |sk AS (
         |  SELECT source, list(h ORDER BY h) AS sketch
         |  FROM rn WHERE rn <= $K GROUP BY source),
         |ex AS (SELECT source, count(*) AS d FROM sh GROUP BY source),
         |pairs AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |         sa.sketch AS ka, sb.sketch AS kb, a.d AS da, b.d AS db
         |  FROM ex a JOIN ex b ON a.source < b.source
         |  JOIN sk sa ON sa.source = a.source
         |  JOIN sk sb ON sb.source = b.source),
         |inter AS (
         |  SELECT x.source AS src_a, y.source AS src_b,
         |         count(*) AS exact_inter
         |  FROM sh x JOIN sh y ON x.h = y.h AND x.source < y.source
         |  GROUP BY 1, 2),
         |m AS (
         |  SELECT p.src_a, p.src_b, p.ka, p.kb, p.da, p.db,
         |         coalesce(i.exact_inter, 0) AS exact_inter,
         |         list_sort(list_distinct(p.ka || p.kb))[1:$K] AS merged
         |  FROM pairs p LEFT JOIN inter i USING (src_a, src_b)),
         |e AS (
         |  SELECT src_a, src_b, da, db, exact_inter,
         |         CAST(len(merged) AS BIGINT) AS merged_size,
         |         merged[-1] AS kth_hash,
         |         CASE WHEN len(merged) < $K
         |              THEN CAST(len(merged) AS DOUBLE)
         |              ELSE ${K - 1}.0 * power(2.0, 60) /
         |                   CAST(merged[-1] AS DOUBLE) END AS est_union,
         |         CAST(len(list_filter(merged,
         |           v -> list_contains(ka, v) AND list_contains(kb, v)))
         |           AS BIGINT) AS n_both
         |  FROM m)
         |SELECT src_a, src_b, da + db - exact_inter AS exact_union,
         |       exact_inter, merged_size, kth_hash, est_union, n_both,
         |       CAST(n_both AS DOUBLE) / CAST(merged_size AS DOUBLE)
         |         AS jaccard_est,
         |       (CAST(n_both AS DOUBLE) / CAST(merged_size AS DOUBLE))
         |         * est_union AS est_inter
         |FROM e ORDER BY src_a, src_b""".stripMargin
  )
}
