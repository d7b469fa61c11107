package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Vectors._
import SimilarityQueries._

/** Persisted ANN index: the build-once / query-many split every
  * billion-scale vector deployment runs (the reference recomputes
  * nothing because it is 157 lines of pandas; at 100 TB the index IS
  * the artifact — built by a nightly job, served by everything else).
  *
  * The in-session ANN family ([[SimilarityQueries]]) derives buckets,
  * cells and codes from the embeddings each run. This module writes
  * those derivations as partitioned parquet tables and serves the same
  * top-K queries from the written tables alone:
  *
  *   - `vectors/`       — the LSH-bucketed vector store, one row per
  *     (table, vector), hive-partitioned by (t, bucket): a probe of
  *     bucket b in table t is a partition-pruned directory read, so
  *     serving cost scales with probed-partition size, never with N.
  *   - `ivf_centroids/` — the coarse-quantizer centroids (bounded by
  *     K; one file, broadcast by every consumer).
  *   - `ivf_assign/`    — (vec_id, cid), partitioned by cid: an IVF
  *     probe reads only its cell partitions.
  *   - `pq_codebook/`   — (m, code, csub), M×Codes rows, broadcast.
  *   - `pq_codes/`      — (vec_id, m, code): 8 bytes of codes per
  *     vector instead of 256 bytes of floats — the table an ADC scan
  *     actually reads.
  *
  * The build stages REUSE the in-session derivations
  * ([[SimilarityQueries.pqSubvectors]]/[[SimilarityQueries.pqCodesOf]],
  * `ivfProbes`, `Vectors.lshBucketAt`), so the persisted index and the
  * in-session queries cannot drift; the serve queries are oracle-pinned
  * to the SAME DuckDB SQL as their in-session twins
  * (`cosine_topk_lsh_hi`, `ivfpq_topk`) — identical answers from the
  * persisted index are part of the gate, not an aspiration.
  */
object AnnIndexQueries {

  /** One index build per (session, sfDir) — every serve query and the
    * manifest consume the same written tables, exactly the
    * build-once/query-many contract the module demonstrates.
    */
  private val indexCache = new SessionMemo[String]

  private[operators] def indexDir(s: SparkSession, d: String): String =
    indexCache.getOrCompute(s, d)(build(s, d))

  /** Index root is namespaced per source dir (two fixture scales in
    * one JVM — the test suites — must not overwrite each other's
    * index mid-read) and per process (see Fs.sinkDir).
    */
  private def root(d: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${graft.Fs.sinkDir("graft_ann_index")}/$h"
  }

  private def build(s: SparkSession, d: String): String = {
    val dir = root(d)
    val emb = embeddings(s, d)

    // LSH vector store: NTables rows per vector, partitioned by
    // (t, bucket). The embedding rides along — the store doubles as
    // the float-vector table for exact scoring/re-rank, laid out so a
    // probe's candidates are one partition directory.
    val lshRows = emb
      .select(col("vec_id"), col("embedding"),
        explode(array((0 until NTables).map(t =>
          struct(lit(t).as("t"),
            lshBucketAt(col("embedding"), NPlanes, t * NPlanes)
              .as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("embedding"),
        col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    lshRows.write.mode("overwrite")
      .partitionBy("t", "bucket").parquet(s"$dir/vectors")

    // IVF: centroid table (bounded by NCells — one file) and the
    // cell assignment, partitioned by cid.
    emb.filter(col("vec_id") < NCells)
      .select(col("vec_id").as("cid"), col("embedding").as("centv"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/ivf_centroids")
    ivfProbes(s, d, 1)
      .select(col("vec_id"), col("cid"))
      .write.mode("overwrite")
      .partitionBy("cid").parquet(s"$dir/ivf_assign")

    // PQ: codebook (M×Codes, one file) + per-vector codes — the same
    // subspace/argmin stages as the in-session encode.
    val subs = pqSubvectors(
      emb.select(col("vec_id"), col("embedding").as("vec")))
    val cents = pqCodebookOf(subs)
    cents.coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/pq_codebook")
    pqCodesOf(subs, cents)
      .write.mode("overwrite").parquet(s"$dir/pq_codes")
    dir
  }

  /** Component stats computed FROM a written table: rows, distinct
    * keys, and an integer content checksum — the triple the manifest
    * oracle-pins against DuckDB re-deriving the same index from the
    * source embeddings.
    */
  private def stats(
      name: String, df: DataFrame,
      key: Column, keyId: Column): DataFrame =
    df.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(keyId).as("n_keys"),
        sum(key).cast("long").as("key_sum"))
      .select(lit(name).as("component"),
        col("n_rows"), col("n_keys"), col("key_sum"))

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](

    // Build (or reuse) the persisted index and report a per-component
    // manifest READ BACK from the written tables — row counts,
    // distinct partition keys, and integer checksums over the derived
    // columns (bucket ids, cell ids, code ids). The oracle re-derives
    // all five components from the source embeddings in DuckDB, so a
    // wrong bucket/cell/code anywhere in the written index moves a
    // checksum and fails the hash.
    "ann_index_build" -> ((s, d) => {
      val dir = indexDir(s, d)
      val vecs = s.read.parquet(s"$dir/vectors")
      val cents = s.read.parquet(s"$dir/ivf_centroids")
      val assign = s.read.parquet(s"$dir/ivf_assign")
      val codebook = s.read.parquet(s"$dir/pq_codebook")
      val codes = s.read.parquet(s"$dir/pq_codes")
      stats("ivf_assign", assign, col("cid"), col("cid"))
        .unionByName(stats("ivf_centroids", cents,
          col("cid"), col("cid")))
        .unionByName(stats("lsh_vectors", vecs, col("bucket"),
          col("t") * lit(1 << NPlanes) + col("bucket")))
        .unionByName(stats("pq_codebook", codebook, col("code"),
          col("m") * lit(PqCodes) + col("code")))
        .unionByName(stats("pq_codes", codes, col("code"),
          col("m") * lit(PqCodes) + col("code")))
        .orderBy("component")
    }),

    // Serve the HIGH-RECALL LSH top-K from the PERSISTED index: probe
    // keys explode from the query rows of the bucketed store, the
    // candidate join hits only probed (t, bucket) partitions, and
    // exact scoring reads float vectors from the store itself — the
    // source embeddings table is never touched (AnnIndexSpec asserts
    // every scan in the plan is under the index root). Pinned to the
    // SAME oracle as the in-session `cosine_topk_lsh_hi`.
    "ann_index_query" -> ((s, d) => {
      val dir = indexDir(s, d)
      val vecs = s.read.parquet(s"$dir/vectors")
      val masks = (0 until (1 << NPlanes))
        .filter(m => Integer.bitCount(m) <= ProbeRadius)
      val probes = vecs
        .filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("t"),
          explode(array(masks.map(m =>
            col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
      val cand = broadcast(probes)
        .join(vecs.select(col("vec_id"), col("t"), col("bucket")),
          Seq("t", "bucket"))
        .filter(col("qid") =!= col("vec_id"))
        .select("qid", "vec_id")
        .distinct()
      // Canonical float-vector copy: table 0 of the store (each table
      // carries the full vector set).
      val store = vecs.filter(col("t") === 0)
        .select(col("vec_id"), col("embedding"))
      val qe = store.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val w = Window.partitionBy("qid")
        .orderBy(col("sim").desc, col("vec_id").asc)
      cand
        .join(broadcast(qe), Seq("qid"))
        .join(store, Seq("vec_id"))
        .withColumn("sim", cosine(col("qe"), col("embedding")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TopK)
        .select("qid", "vec_id", "rnk", "sim")
        .orderBy("qid", "rnk")
    }),

    // Serve IVF-PQ top-K from the PERSISTED index: centroids broadcast
    // from the bounded centroid table, candidates arrive through the
    // cid-partitioned assignment, and ADC scores against the codeword
    // reconstruction decoded from pq_codes ⋈ pq_codebook (the decode
    // tail is shared with the in-session encode, so the order-pinned
    // L2 fold sees identical arrays). Pinned to the SAME oracle as
    // the in-session `ivfpq_topk`.
    "ann_index_ivfpq" -> ((s, d) => {
      val dir = indexDir(s, d)
      val store = s.read.parquet(s"$dir/vectors")
        .filter(col("t") === 0)
        .select(col("vec_id"), col("embedding"))
      val cents = s.read.parquet(s"$dir/ivf_centroids")
      val assign = s.read.parquet(s"$dir/ivf_assign")
      val codebook = s.read.parquet(s"$dir/pq_codebook")
      val codes = s.read.parquet(s"$dir/pq_codes")
      val recon = pqReconFromCodes(codes, codebook)
      val q = store.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val wProbe = Window.partitionBy("qid")
        .orderBy(col("csim").desc, col("cid").asc)
      val qprobes = q
        .crossJoin(broadcast(cents)) // bounded by NCells
        .withColumn("csim", cosine(col("qe"), col("centv")))
        .withColumn("crn", row_number().over(wProbe))
        .filter(col("crn") <= 2)
        .select("qid", "cid")
      val wTop = Window.partitionBy("qid")
        .orderBy(col("ad2").asc, col("vec_id").asc)
      broadcast(qprobes)
        .join(assign, Seq("cid"))
        .filter(col("qid") =!= col("vec_id"))
        .select("qid", "vec_id")
        .distinct()
        .join(recon, Seq("vec_id"))
        .join(broadcast(q), Seq("qid"))
        .withColumn("ad2", l2sq(col("qe"), col("recon")))
        .withColumn("rnk", row_number().over(wTop))
        .filter(col("rnk") <= TopK)
        .select("qid", "vec_id", "rnk", "ad2")
        .orderBy("qid", "rnk")
    }))

  val oracleSql: Map[String, String] = Map(
    // Re-derive all five index components from the source embeddings
    // with the same CTE chains the in-session oracles use, and emit
    // the same (rows, keys, checksum) triple per component.
    "ann_index_build" ->
      s"""WITH $normCte,
         |$assignCte,
         |${tableBucketCte("t0", 0)},
         |${tableBucketCte("t1", NPlanes)},
         |$pqReconCtes,
         |lshrows AS (
         |  SELECT 0 AS t, vec_id, bucket FROM t0
         |  UNION ALL
         |  SELECT 1 AS t, vec_id, bucket FROM t1
         |)
         |SELECT component, n_rows, n_keys, key_sum FROM (
         |  SELECT 'ivf_assign' AS component, count(*) AS n_rows,
         |         count(DISTINCT cid) AS n_keys,
         |         CAST(sum(cid) AS BIGINT) AS key_sum
         |  FROM assign
         |  UNION ALL
         |  SELECT 'ivf_centroids', count(*), count(DISTINCT vec_id),
         |         CAST(sum(vec_id) AS BIGINT)
         |  FROM embeddings WHERE vec_id < $NCells
         |  UNION ALL
         |  SELECT 'lsh_vectors', count(*),
         |         count(DISTINCT t * ${1 << NPlanes} + bucket),
         |         CAST(sum(bucket) AS BIGINT)
         |  FROM lshrows
         |  UNION ALL
         |  SELECT 'pq_codebook', count(*),
         |         count(DISTINCT m * $PqCodes + code),
         |         CAST(sum(code) AS BIGINT)
         |  FROM cents
         |  UNION ALL
         |  SELECT 'pq_codes', count(*),
         |         count(DISTINCT m * $PqCodes + code),
         |         CAST(sum(code) AS BIGINT)
         |  FROM codes
         |) t ORDER BY component""".stripMargin,
    // The serve paths must reproduce their in-session twins EXACTLY —
    // same oracle strings, so the persisted index cannot drift from
    // the session derivation without failing the gate.
    "ann_index_query" ->
      SimilarityQueries.oracleSql("cosine_topk_lsh_hi"),
    "ann_index_ivfpq" ->
      SimilarityQueries.oracleSql("ivfpq_topk"))
}
