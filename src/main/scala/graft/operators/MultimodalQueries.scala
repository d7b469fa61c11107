package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata alongside (the 100 TB pattern: bytes
  * stay columnar/compressed in parquet, metadata drives partition
  * pruning; decode happens per-partition, never on the driver).
  *
  * The image path uses a REAL codec: `multimodal_decode_png`
  * synthesizes deterministic PNGs into the binary column and decodes
  * them back through `javax.imageio` executor-side, with the oracle
  * recomputing the exact pixel statistics arithmetically (PNG is
  * lossless, so the hash match proves the decode). Formats with no
  * stock-JVM codec (audio/video) keep a clearly-marked deterministic
  * stub with the same per-partition plumbing. Both decoders live in
  * [[MultimodalPipeline]] and are spec-tested.
  */
object MultimodalQueries {

  /** The decoded thumbnail-feature frame, pinned and memoized per
    * (session, dir): the synthesize→encode→decode→featurize pass is
    * the most expensive per-row work in the cross-modal path, and
    * `multimodal_ann` reads the frame four times (probe buckets,
    * candidate buckets, query vectors, candidate vectors) — unpinned,
    * each read would re-run the codec over the corpus.
    */
  private val thumbFeatureCache = new SessionMemo[DataFrame]

  private def pinnedThumbFeatures(
      s: SparkSession, d: String): DataFrame =
    thumbFeatureCache.getOrCompute(s, d)(
      graft.Checkpoints.pin(MultimodalPipeline.thumbFeatures(s, d).toDF()))

  /** Decoded per-frame channel sums, pinned and memoized per
    * (session, dir): the synthesize→demux→decode pass runs ONCE and
    * is shared by `multimodal_video_frames` and `video_scene_change`
    * (unpinned, each consumer re-ran the codec over the corpus —
    * measured ~4 s per extra consumer in the sf0.1 sweep).
    */
  private val frameStatsCache = new SessionMemo[DataFrame]

  private def pinnedFrameStats(s: SparkSession, d: String): DataFrame =
    frameStatsCache.getOrCompute(s, d)(
      graft.Checkpoints.pin(
        MultimodalPipeline.videoFrameStats(s, d).toDF()))

  /** Full-corpus decoded histograms, pinned and memoized: the frame
    * feeds the band signatures AND both sides of the exact verify
    * join in `image_hist_lsh` — unpinned, the PNG codec would run
    * three times over the whole corpus.
    */
  private val histAllCache = new SessionMemo[DataFrame]

  private def pinnedHistAll(s: SparkSession, d: String): DataFrame =
    histAllCache.getOrCompute(s, d)(
      graft.Checkpoints.pin(
        MultimodalPipeline.imageHistogramsAll(s, d).toDF()))

  /** Bucket-viability cap for the histogram LSH, same role (and
    * value) as TextQueries.BucketCap: a band bucket larger than this
    * is poisoned — its postings are dropped from candidate
    * generation (observable: `n_poisoned`-style reporting belongs to
    * the caller), which is what bounds the join output at corpus
    * scale on palette-degenerate data.
    */
  private[graft] val HistBucketCap = 50

  /** Decoded eval-corpus histograms, pinned and memoized: truth,
    * signature, and verify branches of `image_hist_eval` all read the
    * frame — unpinned, the PNG codec would run per consumer.
    */
  private val histEvalCache = new SessionMemo[DataFrame]

  private def pinnedHistEval(s: SparkSession, d: String): DataFrame =
    histEvalCache.getOrCompute(s, d)(
      graft.Checkpoints.pin(
        MultimodalPipeline.imageHistogramsEval(s, d).toDF()))

  /** The PRODUCTION quantized-histogram band generator, shared by the
    * scale path (`image_hist_lsh`) and its eval so the eval scores
    * exactly what production runs: 4 bands of 2 adjacent bins, band
    * key = the pair of 32nd-quantized bin masses, viable buckets are
    * 2..HistBucketCap members (larger ones are palette-degenerate and
    * dropped — the cap-don't-scan rule). Returns (bucket sizes,
    * deduped candidate pairs).
    */
  private def histBandCand(hist: DataFrame): (DataFrame, DataFrame) = {
    val sig = hist
      .withColumn("band", expr("bin DIV 2"))
      .withColumn("q", expr("(32 * c) DIV npix"))
      .groupBy(col("doc_id"), col("band"))
      .agg(
        max(when(col("bin") % 2 === 0, col("q"))).as("k0"),
        max(when(col("bin") % 2 === 1, col("q"))).as("k1"))
    val sizes = sig
      .groupBy("band", "k0", "k1")
      .agg(count(lit(1)).as("n"))
    val ok = sizes
      .filter(col("n").between(2, HistBucketCap))
      .select("band", "k0", "k1")
    val small = sig.join(ok, Seq("band", "k0", "k1"), "left_semi")
    val cand = small
      .select(col("band"), col("k0"), col("k1"), col("doc_id").as("a"))
      .join(
        small.select(
          col("band"), col("k0"), col("k1"), col("doc_id").as("b")),
        Seq("band", "k0", "k1"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
    (sizes, cand)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary-column metadata extraction over synthesized payloads
    // (documents.text re-encoded as the opaque media bytes).
    "multimodal_meta" -> ((s, d) =>
      documents(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .select(
          col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("content_md5"),
          hex(substring(col("payload"), 1, 8)).as("header_hex"),
          // STUB decode: deterministic fake dimensions derived from
          // the byte length — a real deployment swaps this expression
          // for a per-partition codec call (see MultimodalPipeline).
          (col("n_chars") % 640 + 1).cast("int").as("stub_width"),
          (col("n_chars") % 480 + 1).cast("int").as("stub_height"),
          (octet_length(col("payload")) / lit(100) + 1).cast("int")
            .as("stub_n_frames"))
        .orderBy("doc_id")),

    // REAL image decode: synthesize a deterministic PNG per document
    // (dimensions and pixel RGB derived from doc_id), then decode the
    // binary payload back through javax.imageio in a per-partition
    // typed map and reduce to exact per-channel pixel sums. The
    // oracle computes the same sums from the pixel formula directly —
    // only a faithful encode→decode round trip can match it.
    "multimodal_decode_png" -> ((s, d) =>
      MultimodalPipeline.decodePngStats(s, d).toDF().orderBy("doc_id")),

    // REAL image resize: decode the PNG, nearest-neighbor downsample
    // to a fixed 4×3 thumbnail, emit its exact channel sums — the
    // feature-extraction pass (downsample before embedding). Sampled
    // source coordinates are pure integer arithmetic, so the oracle
    // recomputes the thumbnail without any codec.
    "multimodal_resize" -> ((s, d) =>
      MultimodalPipeline.resizeStats(s, d).toDF().orderBy("doc_id")),

    // COLOR-HISTOGRAM near-dup over REAL decodes — the
    // pre-embedding visual screen (pHash catches structural dupes;
    // histogram distance catches palette-level ones like re-encodes
    // and crops): each image's 8-bin R-channel histogram comes from
    // decoded pixels, pairs join on the BIN key (all 8 bins emitted,
    // zeros included, so the L1 sees every coordinate), and the L1
    // threshold cross-multiplies against the pixel counts —
    // 10·Σ|c_a·n_b − c_b·n_a| ≤ n_a·n_b is exactly L1 ≤ 100‰ with
    // per-image normalization and ZERO floats. Pairs run over the
    // bounded 100-image eval sample; at scale the pair source swaps
    // for an LSH bucket join like every other near-dup family.
    "image_hist_neardup" -> ((s, d) => {
      val hist = MultimodalPipeline.imageHistograms(s, d).toDF()
      val a = hist.toDF("a", "bin", "ca", "na")
      val b = hist.toDF("b", "bin", "cb", "nb")
      a.join(b, Seq("bin"))
        .filter(col("a") < col("b"))
        .groupBy("a", "b")
        .agg(
          sum(abs(col("ca") * col("nb") - col("cb") * col("na")))
            .as("l1num"),
          max(col("na") * col("nb")).as("den"))
        .filter(col("l1num") * 10 <= col("den"))
        .withColumn("l1_pm", expr("1000 * l1num DIV den"))
        .select("a", "b", "l1num", "den", "l1_pm")
        .orderBy("a", "b")
    }),

    // The SCALE PATH for the visual-histogram family: same exact L1
    // verify as `image_hist_neardup`, but candidates come from a
    // band-bucket EQUI-join over the WHOLE corpus (no eval-sample
    // cap) — the shape every other near-dup family here uses. Each
    // image's 8-bin histogram splits into 4 bands of 2 adjacent
    // bins; a band's key is the pair of 32nd-quantized bin masses
    // ((32·c) DIV npix — integer, so the oracle replays it exactly),
    // and two images are candidates iff they share some band's full
    // key in a VIABLE bucket (2..HistBucketCap members; larger
    // buckets are palette-degenerate and dropped, the same
    // cap-don't-scan rule as the MinHash band join). Candidate pairs
    // dedup across bands before the 8-row-per-pair exact verify, so
    // the verify cost is per-pair, not per-(pair×band).
    "image_hist_lsh" -> ((s, d) => {
      val hist = pinnedHistAll(s, d)
      val (_, cand) = histBandCand(hist)
      val ha = hist.toDF("a", "bin", "ca", "na")
      val hb = hist.toDF("b", "bin", "cb", "nb")
      cand
        .join(ha, Seq("a"))
        .join(hb, Seq("b", "bin"))
        .groupBy("a", "b")
        .agg(
          sum(abs(col("ca") * col("nb") - col("cb") * col("na")))
            .as("l1num"),
          max(col("na") * col("nb")).as("den"))
        .filter(col("l1num") * 10 <= col("den"))
        .withColumn("l1_pm", expr("1000 * l1num DIV den"))
        .select("a", "b", "l1num", "den", "l1_pm")
        .orderBy("a", "b")
    }),

    // VISUAL-LSH CANDIDATE-GENERATOR EVAL — `minhash_eval`'s role for
    // the image family, on a corpus where the numbers MEAN something:
    // 20 clustered palettes (two occupied bins each) with perturbed
    // near-dups (≤3-of-128-pixel shifts) and same-palette non-dups
    // (8-pixel steps), REAL PNG encode→decode on the Spark side, the
    // pixel formula replayed arithmetically by the oracle. Ground
    // truth is the exact pairwise cross-multiplied L1 ≤ 100‰ over the
    // bounded 200-image sample; candidates come from the PRODUCTION
    // band generator (same keys, same HistBucketCap — cap-drops count
    // against recall exactly as in production). Output is one row of
    // exact counts, the poisoned-bucket count (the cap trade, still
    // reported), and precision/recall in integer ppm. Design recall
    // at the 200-image corpus is 89% — the loss is real quantization-
    // boundary misses, not fixture degeneracy.
    "image_hist_eval" -> ((s, d) => {
      val hist = pinnedHistEval(s, d)
      val a = hist.toDF("a", "bin", "ca", "na")
      val b = hist.toDF("b", "bin", "cb", "nb")
      val truth = a.join(b, Seq("bin"))
        .filter(col("a") < col("b"))
        .groupBy("a", "b")
        .agg(
          sum(abs(col("ca") * col("nb") - col("cb") * col("na")))
            .as("l1num"),
          max(col("na") * col("nb")).as("den"))
        .filter(col("l1num") * 10 <= col("den"))
        .select("a", "b")
      val (sizes, cand) = histBandCand(hist)
      val tp = cand.join(truth, Seq("a", "b"), "left_semi")
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_cand"))))
        .crossJoin(broadcast(tp.agg(count(lit(1)).as("n_tp"))))
        .crossJoin(broadcast(sizes.agg(
          sum(when(col("n") > HistBucketCap, 1L).otherwise(0L))
            .as("n_poisoned_buckets"))))
        .withColumn("precision_ppm",
          when(col("n_cand") > 0, expr("1000000 * n_tp DIV n_cand")))
        .withColumn("recall_ppm",
          when(col("n_truth") > 0, expr("1000000 * n_tp DIV n_truth")))
    }),

    // REAL audio decode: synthesize an 8-bit mono PCM WAV per doc via
    // javax.sound.sampled, decode it back, and report header fields
    // (frame count, rate, depth — parsed from the container, not
    // assumed) plus exact sample statistics.
    "multimodal_audio_wav" -> ((s, d) =>
      MultimodalPipeline.audioStats(s, d).toDF().orderBy("doc_id")),

    // REAL video frame sampling: a length-prefixed container of PNG
    // frames per doc; every 2nd frame is decoded through javax.imageio
    // (the rest are SKIPPED, never inflated — the cheap-frame-sample
    // access pattern) and reduced to exact per-frame channel sums.
    "multimodal_video_frames" -> ((s, d) =>
      pinnedFrameStats(s, d)
        .orderBy("doc_id", "frame_idx")),

    // Scene-change detection over the sampled frames: a boundary is a
    // frame whose summed per-channel delta vs the previous sampled
    // frame exceeds 25% of their combined mass — the shot-
    // segmentation pass a video-curation pipeline runs before
    // per-scene captioning. Pure integer compare (delta·4 >
    // cur+prev), computed with one lag window per doc over the
    // already-decoded frame sums; no second decode pass.
    "video_scene_change" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("frame_idx")
      pinnedFrameStats(s, d)
        .withColumn("total",
          col("sum_r") + col("sum_g") + col("sum_b"))
        .withColumn("delta",
          abs(col("sum_r") - lag("sum_r", 1).over(w)) +
            abs(col("sum_g") - lag("sum_g", 1).over(w)) +
            abs(col("sum_b") - lag("sum_b", 1).over(w)))
        .withColumn("prev_total", lag("total", 1).over(w))
        .withColumn("boundary",
          col("prev_total").isNotNull &&
            col("delta") * 4 > col("total") + col("prev_total"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_frames"),
          sum(when(col("boundary"), 1L).otherwise(0L))
            .as("n_boundaries"),
          max(coalesce(col("delta"), lit(0L))).as("max_delta"))
        .orderBy("doc_id")
    }),

    // PERCEPTUAL-HASH image near-dup — the image twin of simhash
    // dedup, composed from the really-decoded thumbnails: per-cell
    // luma (r+g+b over the 4×3 grid), aHash bit i = luma_i·12 >
    // total (exact integer compare, no float mean), 12-bit hash
    // banded 3×4 bits — pigeonhole-complete for Hamming ≤ 2. Pairs
    // come from band equi-joins (never all-pairs), exact Hamming
    // confirms. The whole path is arithmetic on decoded pixels, so
    // the oracle rebuilds hash, bands and distances from the pixel
    // formula.
    "phash_neardup" -> ((s, d) => {
      val feats = pinnedThumbFeatures(s, d)
      val lums = (0 until 12).map(i =>
        (element_at(col("feature"), 3 * i + 1)
          + element_at(col("feature"), 3 * i + 2)
          + element_at(col("feature"), 3 * i + 3))
          .cast("long").as(s"lum$i"))
      val withLum = feats.select(col("doc_id") +: lums: _*)
        .withColumn("total",
          (0 until 12).map(i => col(s"lum$i")).reduce(_ + _))
      val ph = withLum.select(
        col("doc_id"),
        (0 until 12).map(i =>
          when(col(s"lum$i") * 12 > col("total"), lit(1L << i))
            .otherwise(0L)).reduce(_ + _).as("phash"))
      val bands = ph.select(
        col("doc_id"), col("phash"),
        explode(array((0 until 3).map(b =>
          struct(
            lit(b).as("band_idx"),
            shiftright(col("phash"), 4 * b).bitwiseAND(lit(15L))
              .as("band_val"))): _*)).as("bd"))
        .select(col("doc_id"), col("phash"),
          col("bd.band_idx"), col("bd.band_val"))
      val cand = bands
        .select(col("band_idx"), col("band_val"),
          col("doc_id").as("a"), col("phash").as("pa"))
        .join(
          bands.select(col("band_idx"), col("band_val"),
            col("doc_id").as("b"), col("phash").as("pb")),
          Seq("band_idx", "band_val"))
        .filter(col("a") < col("b"))
        .select("a", "b", "pa", "pb")
        .distinct()
      cand
        .withColumn("hamming",
          bit_count(col("pa").bitwiseXOR(col("pb"))).cast("int"))
        .filter(col("hamming") <= 2)
        .select("a", "b", "hamming")
        .orderBy("a", "b")
    }),

    // AUDIO near-dup — the audio twin of phash_neardup, closing the
    // modality symmetry (text simhash / image aHash / audio energy
    // fingerprint): the really-decoded PCM reduces to 16 interleaved
    // window sums (MultimodalPipeline.audioWindowSums), fingerprint
    // bit j = windowSum_j·16 > total (exact integer compare), 16-bit
    // hash banded 4×4 bits — pigeonhole-complete for Hamming ≤ 2.
    // Candidates come from band equi-joins, never all-pairs; the
    // oracle rebuilds window sums, hash and bands from the PCM sample
    // formula, so only a faithful decode matches.
    "audio_neardup" -> ((s, d) => {
      val sig = MultimodalPipeline.audioWindowSums(s, d).toDF()
      val withS = sig.select(
        col("doc_id") +:
          (0 until 16).map(j =>
            element_at(col("wsums"), j + 1).as(s"s$j")): _*)
        .withColumn("total",
          (0 until 16).map(j => col(s"s$j")).reduce(_ + _))
      // Pinned: the (doc_id, ahash) frame feeds BOTH sides of the
      // band self-join below — as a plain subtree each side re-ran
      // the synthesize→decode over the corpus (the pinnedThumbFeatures
      // rationale; 5000 rows of (long, long) is the whole pin).
      val ah = graft.Checkpoints.pin(withS.select(
        col("doc_id"),
        (0 until 16).map(j =>
          when(col(s"s$j") * 16 > col("total"), lit(1L << j))
            .otherwise(0L)).reduce(_ + _).as("ahash")))
      val bands = ah.select(
        col("doc_id"), col("ahash"),
        explode(array((0 until 4).map(b =>
          struct(
            lit(b).as("band_idx"),
            shiftright(col("ahash"), 4 * b).bitwiseAND(lit(15L))
              .as("band_val"))): _*)).as("bd"))
        .select(col("doc_id"), col("ahash"),
          col("bd.band_idx"), col("bd.band_val"))
      bands
        .select(col("band_idx"), col("band_val"),
          col("doc_id").as("a"), col("ahash").as("pa"))
        .join(
          bands.select(col("band_idx"), col("band_val"),
            col("doc_id").as("b"), col("ahash").as("pb")),
          Seq("band_idx", "band_val"))
        .filter(col("a") < col("b"))
        .select("a", "b", "pa", "pb")
        .distinct()
        .withColumn("hamming",
          bit_count(col("pa").bitwiseXOR(col("pb"))).cast("int"))
        .filter(col("hamming") <= 2)
        .select("a", "b", "hamming")
        .orderBy("a", "b")
    }),

    // CROSS-MODAL retrieval: the multimodal and similarity families
    // composed — the actual pipeline shape (image → feature → ANN).
    // Every document's PNG is really decoded and resized to the 4×3
    // thumbnail FEATURE VECTOR (36 dims), and the existing LSH
    // machinery searches it: deterministic hyperplane buckets, bucket
    // equi-join (never all-pairs), bit-deterministic cosine, top-5
    // per query. All feature values are small integers, so every
    // dot/norm is exact in doubles and the oracle recomputes the
    // whole path — pixels, buckets, ranks — arithmetically.
    "multimodal_ann" -> ((s, d) => {
      // Every read (probe buckets, candidate buckets, query vectors,
      // candidate vectors) hits the PINNED feature frame — the codec
      // runs once per session, not once per consumer. Each query
      // probes its own bucket plus all Hamming-1 neighbors (the same
      // recall repair the text ANN path uses — measured recall@5
      // 0.52 → 1.00 on the spec fixture, MultimodalAnnRecallSpec),
      // so candidate pairs dedup before scoring.
      val feats = pinnedThumbFeatures(s, d)
      val withB = feats.withColumn(
        "bucket",
        graft.functions.Vectors.lshBucket(col("feature"), 4))
      val q = withB
        .filter(col("doc_id") < 5)
        .select(
          col("doc_id").as("qid"),
          explode(array(
            col("bucket") +: (0 until 4).map(p =>
              col("bucket").bitwiseXOR(lit(1 << p))): _*)).as("bucket"))
      val c = withB.select(col("doc_id").as("cand_id"), col("bucket"))
      val cand = broadcast(q)
        .join(c, Seq("bucket"))
        .filter(col("qid") =!= col("cand_id"))
        .select("qid", "cand_id")
        .distinct()
      val qe = feats
        .filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"), col("feature").as("qe"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid")
        .orderBy(col("sim").desc, col("cand_id").asc)
      cand
        .join(broadcast(qe), Seq("qid"))
        .join(
          feats.select(col("doc_id").as("cand_id"), col("feature").as("ce")),
          Seq("cand_id"))
        .withColumn(
          "sim",
          graft.functions.Vectors.cosine(col("qe"), col("ce")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("qid", "cand_id", "rnk", "sim")
        .orderBy("qid", "rnk")
    }),

    // Byte-stride frame sampling: every 50th byte's value — the
    // "sample frames from video" access pattern over binary columns.
    "multimodal_frame_sample" -> ((s, d) =>
      documents(s, d)
        .filter(col("doc_id") < 10)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .select(
          col("doc_id"),
          posexplode(
            transform(
              sequence(
                lit(1),
                octet_length(col("payload")).cast("int"),
                lit(50)),
              i => hex(substring(col("payload"), i, lit(1))))))
        .select(
          col("doc_id"),
          col("pos").as("frame_idx"),
          col("col").as("frame_byte_hex"))
        .orderBy("doc_id", "frame_idx"))
  )

  // The Spark queries slice BYTES of the UTF-8 payload. DuckDB 1.0 has
  // no BLOB substring, so the oracles index bytes through the hex
  // encoding instead: byte i of encode(text) is hex chars 2i-1..2i of
  // hex(encode(text)). Purely byte-based — correct for non-ASCII
  // documents too, not just the ASCII fixture.
  val oracleSql: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(strlen(text) AS INTEGER) AS n_bytes,
        |       md5(text) AS content_md5,
        |       substring(hex(encode(text)), 1, 16) AS header_hex,
        |       CAST(n_chars % 640 + 1 AS INTEGER) AS stub_width,
        |       CAST(n_chars % 480 + 1 AS INTEGER) AS stub_height,
        |       CAST(strlen(text) // 100 + 1 AS INTEGER) AS stub_n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_decode_png" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |         CAST(doc_id % 13 + 4 AS INTEGER) AS width,
        |         CAST(doc_id % 7 + 3 AS INTEGER) AS height
        |  FROM documents
        |), xs AS (
        |  SELECT doc_id, width, height,
        |         unnest(generate_series(0, width - 1)) AS x
        |  FROM dims
        |), px AS (
        |  SELECT doc_id, width, height, x,
        |         unnest(generate_series(0, height - 1)) AS y
        |  FROM xs
        |)
        |SELECT doc_id, width, height,
        |       CAST(SUM((x*31 + y*17 + doc_id) % 256) AS BIGINT) AS sum_r,
        |       CAST(SUM((x*7 + y*29 + doc_id*3) % 256) AS BIGINT) AS sum_g,
        |       CAST(SUM((x*13 + y*5 + doc_id*7) % 256) AS BIGINT) AS sum_b
        |FROM px
        |GROUP BY doc_id, width, height
        |ORDER BY doc_id""".stripMargin,
    "image_hist_neardup" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |         CAST(doc_id % 13 + 4 AS INTEGER) AS w,
        |         CAST(doc_id % 7 + 3 AS INTEGER) AS h
        |  FROM documents WHERE doc_id < 100
        |), px AS (
        |  SELECT doc_id, w, h, x,
        |         unnest(generate_series(0, h - 1)) AS y
        |  FROM (SELECT doc_id, w, h,
        |          unnest(generate_series(0, w - 1)) AS x
        |        FROM dims) q
        |), cnt AS (
        |  SELECT doc_id,
        |         ((x*31 + y*17 + doc_id) % 256) // 32 AS bin,
        |         count(*) AS c
        |  FROM px GROUP BY 1, 2
        |), hh AS (
        |  SELECT d.doc_id, g.bin,
        |         CAST(coalesce(c.c, 0) AS BIGINT) AS c,
        |         CAST(d.w * d.h AS BIGINT) AS np
        |  FROM dims d
        |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bin) g
        |  LEFT JOIN cnt c ON c.doc_id = d.doc_id AND c.bin = g.bin
        |), pr AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b,
        |         CAST(sum(abs(x.c*y.np - y.c*x.np)) AS BIGINT)
        |           AS l1num,
        |         CAST(max(x.np*y.np) AS BIGINT) AS den
        |  FROM hh x JOIN hh y
        |    ON x.bin = y.bin AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT a, b, l1num, den,
        |       CAST(1000 * l1num // den AS BIGINT) AS l1_pm
        |FROM pr WHERE l1num * 10 <= den
        |ORDER BY a, b""".stripMargin,
    "image_hist_lsh" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |         CAST(doc_id % 13 + 4 AS INTEGER) AS w,
        |         CAST(doc_id % 7 + 3 AS INTEGER) AS h
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, w, h, x,
        |         unnest(generate_series(0, h - 1)) AS y
        |  FROM (SELECT doc_id, w, h,
        |          unnest(generate_series(0, w - 1)) AS x
        |        FROM dims) q
        |), cnt AS (
        |  SELECT doc_id,
        |         ((x*31 + y*17 + doc_id) % 256) // 32 AS bin,
        |         count(*) AS c
        |  FROM px GROUP BY 1, 2
        |), hh AS (
        |  SELECT d.doc_id, g.bin,
        |         CAST(coalesce(c.c, 0) AS BIGINT) AS c,
        |         CAST(d.w * d.h AS BIGINT) AS np
        |  FROM dims d
        |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bin) g
        |  LEFT JOIN cnt c ON c.doc_id = d.doc_id AND c.bin = g.bin
        |), sig AS (
        |  SELECT doc_id, bin // 2 AS band,
        |         max(CASE WHEN bin % 2 = 0 THEN (32*c) // np END)
        |           AS k0,
        |         max(CASE WHEN bin % 2 = 1 THEN (32*c) // np END)
        |           AS k1
        |  FROM hh GROUP BY 1, 2
        |), ok AS (
        |  SELECT band, k0, k1 FROM sig
        |  GROUP BY 1, 2, 3
        |  HAVING count(*) BETWEEN 2 AND 50
        |), small AS (
        |  SELECT s.* FROM sig s JOIN ok o
        |    ON s.band = o.band AND s.k0 = o.k0 AND s.k1 = o.k1
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM small x JOIN small y
        |    ON x.band = y.band AND x.k0 = y.k0 AND x.k1 = y.k1
        |   AND x.doc_id < y.doc_id
        |), pr AS (
        |  SELECT c.a, c.b,
        |         CAST(sum(abs(x.c*y.np - y.c*x.np)) AS BIGINT)
        |           AS l1num,
        |         CAST(max(x.np*y.np) AS BIGINT) AS den
        |  FROM cand c
        |  JOIN hh x ON x.doc_id = c.a
        |  JOIN hh y ON y.doc_id = c.b AND y.bin = x.bin
        |  GROUP BY 1, 2
        |)
        |SELECT a, b, l1num, den,
        |       CAST(1000 * l1num // den AS BIGINT) AS l1_pm
        |FROM pr WHERE l1num * 10 <= den
        |ORDER BY a, b""".stripMargin,
    "image_hist_eval" ->
      """WITH mm AS (
        |  SELECT doc_id, doc_id % 20 AS c,
        |         CASE WHEN doc_id // 20 < 4
        |           THEN doc_id // 20 + 1 + (doc_id % 20) % 2
        |           ELSE 16 + 8 * (doc_id // 20 - 4) END AS m
        |  FROM documents WHERE doc_id < 200
        |), px AS (
        |  SELECT doc_id, c, m, unnest(generate_series(0, 127)) AS p
        |  FROM mm
        |), cnt AS (
        |  SELECT doc_id,
        |         CASE WHEN p < 96 - m THEN c % 8
        |              ELSE (c + 3) % 8 END AS bin,
        |         count(*) AS c
        |  FROM px GROUP BY 1, 2
        |), hh AS (
        |  SELECT d.doc_id, g.bin,
        |         CAST(coalesce(c.c, 0) AS BIGINT) AS c,
        |         CAST(128 AS BIGINT) AS np
        |  FROM mm d
        |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bin) g
        |  LEFT JOIN cnt c ON c.doc_id = d.doc_id AND c.bin = g.bin
        |), truth AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b
        |  FROM hh x JOIN hh y
        |    ON x.bin = y.bin AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2
        |  HAVING sum(abs(x.c*y.np - y.c*x.np)) * 10 <= max(x.np*y.np)
        |), sig AS (
        |  SELECT doc_id, bin // 2 AS band,
        |         max(CASE WHEN bin % 2 = 0 THEN (32*c) // np END)
        |           AS k0,
        |         max(CASE WHEN bin % 2 = 1 THEN (32*c) // np END)
        |           AS k1
        |  FROM hh GROUP BY 1, 2
        |), sizes AS (
        |  SELECT band, k0, k1, count(*) AS n FROM sig
        |  GROUP BY 1, 2, 3
        |), small AS (
        |  SELECT s.* FROM sig s JOIN sizes o
        |    ON s.band = o.band AND s.k0 = o.k0 AND s.k1 = o.k1
        |  WHERE o.n BETWEEN 2 AND 50
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM small x JOIN small y
        |    ON x.band = y.band AND x.k0 = y.k0 AND x.k1 = y.k1
        |   AND x.doc_id < y.doc_id
        |), counts AS (
        |  SELECT (SELECT count(*) FROM truth) AS n_truth,
        |         (SELECT count(*) FROM cand) AS n_cand,
        |         (SELECT count(*) FROM cand c JOIN truth t
        |            ON t.a = c.a AND t.b = c.b) AS n_tp,
        |         (SELECT coalesce(sum(CASE WHEN n > 50 THEN 1 END), 0)
        |            FROM sizes) AS n_poisoned_buckets
        |)
        |SELECT CAST(n_truth AS BIGINT) AS n_truth,
        |       CAST(n_cand AS BIGINT) AS n_cand,
        |       CAST(n_tp AS BIGINT) AS n_tp,
        |       CAST(n_poisoned_buckets AS BIGINT) AS n_poisoned_buckets,
        |       CASE WHEN n_cand > 0
        |         THEN CAST(1000000 * n_tp // n_cand AS BIGINT)
        |       END AS precision_ppm,
        |       CASE WHEN n_truth > 0
        |         THEN CAST(1000000 * n_tp // n_truth AS BIGINT)
        |       END AS recall_ppm
        |FROM counts""".stripMargin,
    "multimodal_resize" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |         doc_id % 13 + 4 AS w,
        |         doc_id % 7 + 3 AS h
        |  FROM documents
        |), txs AS (
        |  SELECT doc_id, w, h, unnest(generate_series(0, 3)) AS tx
        |  FROM dims
        |), px AS (
        |  SELECT doc_id, w, h, tx, unnest(generate_series(0, 2)) AS ty
        |  FROM txs
        |), sampled AS (
        |  SELECT doc_id, w, h, (tx*w)//4 AS sx, (ty*h)//3 AS sy
        |  FROM px
        |)
        |SELECT doc_id,
        |       CAST(w AS INTEGER) AS src_w,
        |       CAST(h AS INTEGER) AS src_h,
        |       CAST(SUM((sx*31 + sy*17 + doc_id) % 256) AS BIGINT)
        |         AS thumb_sum_r,
        |       CAST(SUM((sx*7 + sy*29 + doc_id*3) % 256) AS BIGINT)
        |         AS thumb_sum_g,
        |       CAST(SUM((sx*13 + sy*5 + doc_id*7) % 256) AS BIGINT)
        |         AS thumb_sum_b
        |FROM sampled
        |GROUP BY doc_id, w, h
        |ORDER BY doc_id""".stripMargin,
    "multimodal_audio_wav" ->
      """WITH n_ AS (
        |  SELECT doc_id, doc_id % 50 + 20 AS n FROM documents
        |), smp AS (
        |  SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i
        |  FROM n_
        |)
        |SELECT doc_id,
        |       CAST(min(n) AS BIGINT) AS n_frames,
        |       CAST(8000 AS INTEGER) AS sample_rate,
        |       CAST(8 AS INTEGER) AS bits,
        |       CAST(SUM((i*37 + doc_id*13 + 11) % 256) AS BIGINT)
        |         AS sum_samples,
        |       CAST(MAX((i*37 + doc_id*13 + 11) % 256) AS INTEGER)
        |         AS max_sample
        |FROM smp GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "multimodal_video_frames" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |         doc_id % 13 + 4 AS w,
        |         doc_id % 7 + 3 AS h,
        |         doc_id % 4 + 2 AS n
        |  FROM documents
        |), frames AS (
        |  SELECT doc_id, w, h, unnest(generate_series(0, n - 1)) AS f
        |  FROM dims
        |), sampled AS (
        |  SELECT doc_id, w, h, f FROM frames WHERE f % 2 = 0
        |), xs AS (
        |  SELECT doc_id, w, h, f, unnest(generate_series(0, w - 1)) AS x
        |  FROM sampled
        |), px AS (
        |  SELECT doc_id, w, h, f, x, unnest(generate_series(0, h - 1)) AS y
        |  FROM xs
        |)
        |SELECT doc_id,
        |       CAST(f AS INTEGER) AS frame_idx,
        |       CAST(w AS INTEGER) AS width,
        |       CAST(h AS INTEGER) AS height,
        |       CAST(SUM((x*31 + y*17 + doc_id + f*101) % 256) AS BIGINT)
        |         AS sum_r,
        |       CAST(SUM((x*7 + y*29 + doc_id*3 + f*59) % 256) AS BIGINT)
        |         AS sum_g,
        |       CAST(SUM((x*13 + y*5 + doc_id*7 + f*23) % 256) AS BIGINT)
        |         AS sum_b
        |FROM px
        |GROUP BY doc_id, f, w, h
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // Same frame-sum formulas, then the identical lag-window boundary
    // predicate (integer 25% relative-change compare).
    "video_scene_change" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |         doc_id % 13 + 4 AS w,
        |         doc_id % 7 + 3 AS h,
        |         doc_id % 4 + 2 AS n
        |  FROM documents
        |), frames AS (
        |  SELECT doc_id, w, h, unnest(generate_series(0, n - 1)) AS f
        |  FROM dims
        |), sampled AS (
        |  SELECT doc_id, w, h, f FROM frames WHERE f % 2 = 0
        |), xs AS (
        |  SELECT doc_id, w, h, f, unnest(generate_series(0, w - 1)) AS x
        |  FROM sampled
        |), px AS (
        |  SELECT doc_id, w, h, f, x, unnest(generate_series(0, h - 1)) AS y
        |  FROM xs
        |), fs AS (
        |  SELECT doc_id, f,
        |         CAST(SUM((x*31 + y*17 + doc_id + f*101) % 256) AS BIGINT)
        |           AS sum_r,
        |         CAST(SUM((x*7 + y*29 + doc_id*3 + f*59) % 256) AS BIGINT)
        |           AS sum_g,
        |         CAST(SUM((x*13 + y*5 + doc_id*7 + f*23) % 256) AS BIGINT)
        |           AS sum_b
        |  FROM px GROUP BY doc_id, f
        |), lg AS (
        |  SELECT doc_id, f,
        |         sum_r + sum_g + sum_b AS total,
        |         abs(sum_r - lag(sum_r) OVER win)
        |           + abs(sum_g - lag(sum_g) OVER win)
        |           + abs(sum_b - lag(sum_b) OVER win) AS delta,
        |         lag(sum_r + sum_g + sum_b) OVER win AS prev_total
        |  FROM fs
        |  WINDOW win AS (PARTITION BY doc_id ORDER BY f)
        |)
        |SELECT doc_id, count(*) AS n_frames,
        |       CAST(sum(CASE WHEN prev_total IS NOT NULL
        |         AND delta * 4 > total + prev_total
        |         THEN 1 ELSE 0 END) AS BIGINT) AS n_boundaries,
        |       CAST(max(coalesce(delta, 0)) AS BIGINT) AS max_delta
        |FROM lg GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "audio_neardup" ->
      """WITH n_ AS (
        |  SELECT doc_id, doc_id % 50 + 20 AS n FROM documents
        |), smp AS (
        |  SELECT doc_id, unnest(generate_series(0, n - 1)) AS i
        |  FROM n_
        |), ws AS (
        |  SELECT doc_id, i % 16 AS j,
        |         SUM((i*37 + doc_id*13 + 11) % 256) AS s
        |  FROM smp GROUP BY doc_id, i % 16
        |), tot AS (
        |  SELECT doc_id, SUM(s) AS total FROM ws GROUP BY doc_id
        |), ah AS (
        |  SELECT ws.doc_id,
        |         CAST(SUM(CASE WHEN s * 16 > total
        |           THEN 1 << j ELSE 0 END) AS BIGINT) AS ahash
        |  FROM ws JOIN tot USING (doc_id) GROUP BY ws.doc_id
        |), bands AS (
        |  SELECT doc_id, ahash, u.b AS band_idx,
        |         (ahash // (1 << (4 * u.b))) % 16 AS band_val
        |  FROM ah, LATERAL unnest(range(0, 4)) AS u(b)
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
        |         x.ahash AS pa, y.ahash AS pb
        |  FROM bands x
        |  JOIN bands y ON x.band_idx = y.band_idx
        |    AND x.band_val = y.band_val AND x.doc_id < y.doc_id
        |)
        |SELECT a, b,
        |       CAST(bit_count(xor(pa, pb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(pa, pb)) <= 2
        |ORDER BY a, b""".stripMargin,
    // The whole cross-modal path rebuilt arithmetically: thumbnail
    // feature values from the pixel formula at the sampled integer
    // coordinates, hyperplane buckets from the shared (p·73 + dim·37)
    // weight family, exact-integer dots/norms (every product ≤ 255²,
    // exactly representable — summation order is irrelevant), same
    // (sim DESC, cand ASC) rank. MATERIALIZED: feat is referenced by
    // four consumers.
    "phash_neardup" -> {
      val lum =
        "((tx*w//4)*31 + (ty*h//3)*17 + doc_id) % 256" +
          " + ((tx*w//4)*7 + (ty*h//3)*29 + doc_id*3) % 256" +
          " + ((tx*w//4)*13 + (ty*h//3)*5 + doc_id*7) % 256"
      s"""WITH cells AS (
         |  SELECT doc_id, ty*4 + tx AS cell,
         |         CAST($lum AS BIGINT) AS lum
         |  FROM (SELECT doc_id, doc_id % 13 + 4 AS w,
         |               doc_id % 7 + 3 AS h FROM documents) d,
         |       LATERAL unnest(generate_series(0, 3)) AS a(tx),
         |       LATERAL unnest(generate_series(0, 2)) AS b(ty)
         |), ph AS MATERIALIZED (
         |  SELECT doc_id,
         |         CAST(sum(CASE WHEN lum*12 >
         |             (SELECT sum(c2.lum) FROM cells c2
         |              WHERE c2.doc_id = cells.doc_id)
         |           THEN 1 << cell ELSE 0 END) AS BIGINT) AS phash
         |  FROM cells GROUP BY doc_id
         |), bands AS (
         |  SELECT doc_id, phash, b AS band_idx,
         |         (phash >> (4*b)) & 15 AS band_val
         |  FROM ph, LATERAL unnest(generate_series(0, 2)) t(b)
         |), cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         |         x.phash AS pa, y.phash AS pb
         |  FROM bands x JOIN bands y
         |    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
         |   AND x.doc_id < y.doc_id
         |)
         |SELECT a, b,
         |       CAST(bit_count(xor(pa, pb)) AS INTEGER) AS hamming
         |FROM cand
         |WHERE bit_count(xor(pa, pb)) <= 2
         |ORDER BY a, b""".stripMargin
    },
    "multimodal_ann" -> {
      def chan(sx: String, sy: String, k: Int) = k match {
        case 0 => s"(($sx)*31 + ($sy)*17 + doc_id) % 256"
        case 1 => s"(($sx)*7 + ($sy)*29 + doc_id*3) % 256"
        case _ => s"(($sx)*13 + ($sy)*5 + doc_id*7) % 256"
      }
      val projs = (0 until 4)
        .map(p =>
          s"sum(v * CAST((($p*73 + dim*37) % 19) - 9 AS DOUBLE))" +
            s" AS proj$p")
        .mkString(",\n         ")
      val bits = (0 until 4)
        .map(p => s"(CASE WHEN proj$p > 0 THEN ${1 << p} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH feat AS MATERIALIZED (
         |  SELECT doc_id, (ty*4 + tx)*3 + ch AS dim,
         |         CAST(CASE ch
         |           WHEN 0 THEN ${chan("tx*w//4", "ty*h//3", 0)}
         |           WHEN 1 THEN ${chan("tx*w//4", "ty*h//3", 1)}
         |           ELSE ${chan("tx*w//4", "ty*h//3", 2)}
         |         END AS DOUBLE) AS v
         |  FROM (SELECT doc_id, doc_id % 13 + 4 AS w,
         |               doc_id % 7 + 3 AS h FROM documents) d,
         |       LATERAL unnest(generate_series(0, 3)) AS a(tx),
         |       LATERAL unnest(generate_series(0, 2)) AS b(ty),
         |       LATERAL unnest(generate_series(0, 2)) AS k(ch)
         |), fbuckets AS MATERIALIZED (
         |  SELECT doc_id, $bits AS bucket
         |  FROM (
         |    SELECT doc_id,
         |         $projs
         |    FROM feat GROUP BY doc_id) pr
         |), fnorms AS (
         |  SELECT doc_id, sqrt(sum(v*v)) AS nrm FROM feat GROUP BY doc_id
         |), cand AS (
         |  SELECT q.doc_id AS qid, c.doc_id AS cand_id
         |  FROM fbuckets q JOIN fbuckets c
         |    ON bit_count(CAST(xor(q.bucket, c.bucket) AS BIGINT)) <= 1
         |  WHERE q.doc_id < 5 AND q.doc_id <> c.doc_id
         |), dots AS (
         |  SELECT cand.qid, cand.cand_id, sum(fq.v * fc.v) AS dot
         |  FROM cand
         |  JOIN feat fq ON fq.doc_id = cand.qid
         |  JOIN feat fc ON fc.doc_id = cand.cand_id AND fc.dim = fq.dim
         |  GROUP BY cand.qid, cand.cand_id
         |), sims AS (
         |  SELECT qid, cand_id, d.dot / (nq.nrm * nc.nrm) AS sim
         |  FROM dots d
         |  JOIN fnorms nq ON nq.doc_id = qid
         |  JOIN fnorms nc ON nc.doc_id = cand_id
         |)
         |SELECT qid, cand_id, rnk, sim FROM (
         |  SELECT qid, cand_id, sim,
         |         CAST(row_number() OVER (PARTITION BY qid
         |           ORDER BY sim DESC, cand_id ASC) AS INTEGER) AS rnk
         |  FROM sims) t
         |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin
    },
    "multimodal_frame_sample" ->
      """SELECT doc_id,
        |       CAST(p AS INTEGER) AS frame_idx,
        |       substring(hex(encode(text)), 2*CAST(i AS INTEGER)-1, 2)
        |         AS frame_byte_hex
        |FROM (
        |  SELECT doc_id, text,
        |         unnest(generate_series(1, strlen(text), 50)) AS i,
        |         unnest(generate_series(0,
        |           (strlen(text)-1)//50)) AS p
        |  FROM documents WHERE doc_id < 10) t
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
