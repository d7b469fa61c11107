package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Distributed PCA over the embedding corpus — the covariance-method
  * decomposition every large vector pipeline runs before indexing
  * (dimensionality reduction / whitening ahead of OPQ or IVF; the
  * reference has no linear algebra at all, so this is pure §2b
  * LLM-pipeline surface).
  *
  * The 100 TB shape is the classic split:
  *
  *   - the DATA pass is one scan: quantize each embedding to exact
  *     integers, `posexplode` twice (a narrow per-row d² expansion,
  *     never a self-join — no shuffle until the aggregate), and
  *     hash-aggregate (i, j) sufficient statistics with map-side
  *     partial combine, so the shuffle carries at most d² rows per
  *     map partition regardless of corpus size;
  *   - the EIGEN-SOLVE is bounded driver math: the d×d matrix
  *     (d=64 → 4096 longs) is collected once per (session, corpus)
  *     and power-iterated locally — the same bounded-collect contract
  *     as the k-means refiner and the BPE trainer;
  *   - the PROJECTION is another single scan with the eigenvector
  *     broadcast as a literal: an exact integer dot per row, then a
  *     TakeOrderedAndProject top-K.
  *
  * Everything is fixed-point integer arithmetic (quantize scale
  * [[QScale]], vector scale [[VScale]], max-norm normalization with
  * truncating division applied to non-negative operands only), so
  * Spark, the Scala driver loop, and the DuckDB oracle compute
  * bit-identical BIGINTs end to end — no float summation order
  * anywhere. The eigenvector after exactly [[Iters]] iterations is
  * the pinned artifact: determinism does not depend on convergence,
  * though the spec asserts the iterate has in fact converged onto the
  * dominant eigenvector of the double-precision covariance.
  */
object PcaQueries {

  /** Embedding dim of the fixture corpus (FIXTURES.md §B). */
  private[operators] val Dim = 64

  /** Quantization: q = floor(x * QScale + 0.5), |x| < 1 in the
    * fixture corpus so |q| <= QScale — sufficient statistics stay far
    * below 2^63 (worst case at sf0.1: n=2000 vectors, |ncov| <=
    * 2·(n·QScale)² ≈ 2.2e12).
    */
  private[operators] val QScale = 1000L

  /** Fixed-point scale of the iterated vector: after each max-norm
    * step, max|v| = VScale. Mat-vec terms stay <= d·(|ncov|/n)·VScale
    * ≈ 7e16 at sf0.1.
    */
  private[operators] val VScale = 1000000L

  /** Power-iteration count — part of the pinned spec, not a tuning
    * knob (both engines emit the iterate after exactly this many
    * steps). 64 steps: the fixture spectrum is near-isotropic
    * (λ2/λ1 ≈ 0.93 at sf0.001), so convergence is slow — 64 driver-
    * side mat-vecs on a 64×64 matrix and 64 four-thousand-row oracle
    * CTEs are still trivial.
    */
  private[operators] val Iters = 64

  private[operators] val ProjTopK = 20

  /** Exact integer quantization of the embedding array. */
  private def quant(e: Column): Column =
    transform(e, x =>
      floor(x.cast("double") * lit(QScale.toDouble) + lit(0.5))
        .cast("long"))

  /** The (i, j) sufficient-statistics frame: one narrow scan, d²
    * rows per vector via two chained posexplodes (no join — the spec
    * asserts the plan is join-free), hash-aggregated to the d² cells.
    * ncov = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ (the n-scaled covariance, exact); c =
    * trunc(ncov / n) — the per-n normalization that bounds the
    * mat-vec products independently of corpus size. Truncating
    * division is applied to the non-negative |ncov| (Spark DIV
    * truncates toward zero, DuckDB // floors; they agree only on
    * non-negative operands, so the sign is factored out first).
    */
  private val covCache = new SessionMemo[DataFrame]

  /** One covariance pass per (session, corpus): the frame is pinned
    * and shared by all three registered queries (`pca_covariance`
    * reads it back; the eigen-solve collects it) — the build-once
    * contract the persisted stats table would honor at scale.
    */
  private def covFrame(s: SparkSession, d: String): DataFrame =
    covCache.getOrCompute(s, d)(graft.Checkpoints.pin(covBuild(s, d)))

  private[graft] def covBuild(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"), quant(col("embedding")).as("q"))
      .select(col("q"), posexplode(col("q")).as(Seq("i", "qi")))
      .select(col("i"), col("qi"),
        posexplode(col("q")).as(Seq("j", "qj")))
      .groupBy("i", "j")
      .agg(
        count(lit(1)).as("n_vec"),
        sum(col("qi")).as("si"),
        sum(col("qj")).as("sj"),
        sum(col("qi") * col("qj")).as("sij"))
      .withColumn("ncov",
        col("n_vec") * col("sij") - col("si") * col("sj"))
      .withColumn("c",
        signum(col("ncov")).cast("long") *
          expr("abs(ncov) DIV n_vec"))

  /** Bounded driver-side eigen-solve shared by the eigenvector and
    * projection queries: (n, per-dim sums, eigenvector, Σsᵢvᵢ).
    */
  private case class Eig(
      n: Long, sums: Array[Long], v: Array[Long], sDotV: Long)

  private val eigCache = new SessionMemo[Eig]

  private def eigOf(s: SparkSession, d: String): Eig =
    eigCache.getOrCompute(s, d) {
      val rows = covFrame(s, d)
        .select("i", "j", "n_vec", "si", "c").collect()
      val n = rows.head.getLong(2)
      val c = Array.ofDim[Long](Dim, Dim)
      val sums = Array.ofDim[Long](Dim)
      rows.foreach { r =>
        val (i, j) = (r.getInt(0), r.getInt(1))
        c(i)(j) = r.getLong(4)
        if (j == 0) sums(i) = r.getLong(3)
      }
      var v = Array.fill(Dim)(VScale)
      for (_ <- 0 until Iters) {
        val w = Array.tabulate(Dim) { i =>
          var acc = 0L
          var j = 0
          while (j < Dim) { acc += c(i)(j) * v(j); j += 1 }
          acc
        }
        val t = math.max(w.map(math.abs).max / VScale, 1L)
        v = w.map(x => math.signum(x) * (math.abs(x) / t))
      }
      val sDotV = sums.zip(v).map { case (a, b) => a * b }.sum
      Eig(n, sums, v, sDotV)
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](

    // The covariance sufficient statistics themselves — the artifact
    // a 100 TB job persists (d² longs) so every downstream consumer
    // (whitening, OPQ rotation, drift monitors) reuses the single
    // data pass. All-integer; the oracle re-derives every cell.
    "pca_covariance" -> ((s, d) =>
      covFrame(s, d)
        .select("i", "j", "n_vec", "si", "sij", "ncov")
        .orderBy("i", "j")),

    // Top-10 most-correlated dimension PAIRS from the same pinned
    // covariance frame (zero extra scans — the payoff of persisting
    // the sufficient statistics): corr²(i,j) in exact-operand double
    // form c_ij²/(c_ii·c_jj), i<j, squared so no sqrt enters the
    // pinned output. The redundancy screen an embedding-compression
    // pass (PCA/OPQ dimension dropping) reads first.
    "pca_top_corr" -> ((s, d) => {
      val cov = covFrame(s, d)
      val diag = cov.filter(col("i") === col("j"))
        .select(col("i").as("k"), col("c").as("cdiag"))
      cov.filter(col("i") < col("j"))
        .join(broadcast(diag).withColumnRenamed("k", "i")
          .withColumnRenamed("cdiag", "cii"), Seq("i"))
        .join(broadcast(diag).withColumnRenamed("k", "j")
          .withColumnRenamed("cdiag", "cjj"), Seq("j"))
        .withColumn("corr2",
          (col("c").cast("double") * col("c").cast("double")) /
            (col("cii").cast("double") * col("cjj").cast("double")))
        .select("i", "j", "c", "corr2")
        .orderBy(col("corr2").desc, col("i").asc, col("j").asc)
        .limit(10)
    }),

    // Dominant eigenvector after exactly Iters fixed-point power
    // steps (v0 = all-VScale, max-norm renormalization). 64 rows of
    // BIGINTs; the oracle replays the identical iteration as unrolled
    // integer CTEs, so any drift in quantization, the covariance, or
    // the normalization arithmetic moves a value.
    "pca_power_topvec" -> ((s, d) => {
      val e = eigOf(s, d)
      import s.implicits._
      e.v.zipWithIndex.map { case (v, i) => (i, v) }
        .toSeq.toDF("i", "v")
        .orderBy("i")
    }),

    // Top-K vectors by centered principal-component score: p =
    // n·⟨q, v⟩ − ⟨s, v⟩ (the n-scaled projection of the centered
    // quantized vector — exact longs). The eigenvector and the
    // centering constant ride along as broadcast literals; the scan
    // is one pass + TakeOrderedAndProject.
    "pca_project_topk" -> ((s, d) => {
      val e = eigOf(s, d)
      val vlit = typedLit(e.v.toSeq)
      embeddings(s, d)
        .select(col("vec_id"), quant(col("embedding")).as("q"))
        .withColumn("p",
          lit(e.n) * aggregate(
            zip_with(col("q"), vlit, (a, b) => a * b),
            lit(0L), (acc, x) => acc + x) - lit(e.sDotV))
        .select("vec_id", "p")
        .orderBy(col("p").desc, col("vec_id").asc)
        .limit(ProjTopK)
    }))

  // ------------------------------------------------------------------
  // DuckDB oracles: the same quantization, sufficient statistics and
  // fixed-point iteration, generated as unrolled CTEs (no recursion —
  // the iteration count is a constant of the spec).
  // ------------------------------------------------------------------

  /** Shared CTE chain ending in `cnorm(i, j, n_vec, si, sj, sij,
    * ncov, c)`. DuckDB lists are 1-indexed; `k-1` matches Spark's
    * 0-based posexplode.
    */
  private val covCtes =
    s"""dims AS (SELECT unnest(generate_series(1, $Dim)) AS k),
       |qm AS MATERIALIZED (
       |  SELECT vec_id, k - 1 AS i,
       |         CAST(floor(CAST(embedding[k] AS DOUBLE) * $QScale
       |           + 0.5) AS BIGINT) AS q
       |  FROM embeddings CROSS JOIN dims),
       |covmat AS (
       |  SELECT a.i AS i, b.i AS j, count(*) AS n_vec,
       |         CAST(sum(a.q) AS BIGINT) AS si,
       |         CAST(sum(b.q) AS BIGINT) AS sj,
       |         CAST(sum(a.q * b.q) AS BIGINT) AS sij
       |  FROM qm a JOIN qm b USING (vec_id)
       |  GROUP BY 1, 2),
       |cnorm AS MATERIALIZED (
       |  SELECT i, j, n_vec, si, sj, sij,
       |         n_vec * sij - si * sj AS ncov,
       |         CASE WHEN n_vec * sij - si * sj < 0 THEN -1 ELSE 1 END
       |           * (abs(n_vec * sij - si * sj) // n_vec) AS c
       |  FROM covmat)""".stripMargin

  /** Unrolled power iteration: it0 → (w1, it1) → … → it{Iters}. */
  private val iterCtes: String = {
    val steps = (1 to Iters).map { k =>
      s"""w$k AS MATERIALIZED (
         |  SELECT c.i, CAST(sum(c.c * p.v) AS BIGINT) AS w
         |  FROM cnorm c JOIN it${k - 1} p ON p.i = c.j
         |  GROUP BY 1),
         |it$k AS MATERIALIZED (
         |  SELECT i,
         |         CASE WHEN w < 0 THEN -1 ELSE 1 END
         |           * (abs(w) // greatest(
         |               (SELECT max(abs(w)) FROM w$k) // $VScale, 1))
         |           AS v
         |  FROM w$k)""".stripMargin
    }
    (s"""it0 AS (
        |  SELECT k - 1 AS i, CAST($VScale AS BIGINT) AS v
        |  FROM dims)""".stripMargin +: steps).mkString(",\n")
  }

  val oracleSql: Map[String, String] = Map(
    "pca_covariance" ->
      s"""WITH $covCtes
         |SELECT i, j, n_vec, si, sij, ncov FROM cnorm
         |ORDER BY i, j""".stripMargin,
    "pca_top_corr" ->
      s"""WITH $covCtes
         |SELECT a.i, a.j, a.c,
         |       (CAST(a.c AS DOUBLE) * CAST(a.c AS DOUBLE)) /
         |         (CAST(di.c AS DOUBLE) * CAST(dj.c AS DOUBLE))
         |         AS corr2
         |FROM cnorm a
         |JOIN cnorm di ON di.i = a.i AND di.j = a.i
         |JOIN cnorm dj ON dj.i = a.j AND dj.j = a.j
         |WHERE a.i < a.j
         |ORDER BY corr2 DESC, a.i ASC, a.j ASC
         |LIMIT 10""".stripMargin,
    "pca_power_topvec" ->
      s"""WITH $covCtes,
         |$iterCtes
         |SELECT CAST(i AS INTEGER) AS i, v FROM it$Iters
         |ORDER BY i""".stripMargin,
    "pca_project_topk" ->
      s"""WITH $covCtes,
         |$iterCtes,
         |sdim AS (SELECT i, CAST(sum(q) AS BIGINT) AS si
         |         FROM qm GROUP BY i),
         |nn AS (SELECT count(DISTINCT vec_id) AS n FROM qm),
         |sv AS (SELECT CAST(sum(sd.si * e.v) AS BIGINT) AS sdotv
         |       FROM sdim sd JOIN it$Iters e ON e.i = sd.i),
         |proj AS (
         |  SELECT m.vec_id,
         |         (SELECT n FROM nn) * CAST(sum(m.q * e.v) AS BIGINT)
         |           - (SELECT sdotv FROM sv) AS p
         |  FROM qm m JOIN it$Iters e ON e.i = m.i
         |  GROUP BY m.vec_id)
         |SELECT vec_id, p FROM proj
         |ORDER BY p DESC, vec_id ASC LIMIT $ProjTopK""".stripMargin)
}
