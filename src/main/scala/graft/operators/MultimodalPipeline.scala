package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed per-partition media decode plumbing — the Scala equivalent of
  * a `mapInPandas` decode stage: batch-shaped, executor-side, with
  * per-partition codec initialization amortized across the partition's
  * rows.
  *
  * Codec paths:
  *   - REAL image codec: `javax.imageio` PNG encode/decode (stock-JVM,
  *     no native libraries) — `encodePngPartition` synthesizes
  *     deterministic images into the binary column,
  *     `decodePngPartition` reads them back into exact pixel
  *     statistics, and `resizePartition` adds the nearest-neighbor
  *     thumbnail (feature-extraction) pass; the oracles recompute the
  *     same statistics arithmetically, so a lossy or misaligned decode
  *     cannot pass.
  *   - REAL audio codec: `javax.sound.sampled` WAV/PCM encode/decode —
  *     header fields (frame count, rate, depth) come from the
  *     container, sample sums from the PCM payload, all
  *     arithmetic-oracled.
  *   - Video: the JVM ships no video demuxer, so the container is a
  *     length-prefixed sequence of PNG frames (ours), but every
  *     sampled frame decodes through the real image codec and skipped
  *     frames are never inflated — the access pattern that makes
  *     frame sampling cheap on real footage.
  *   - `decodeStub` remains as the swap-one-function template for
  *     codecs outside the stock JVM (H.264, Opus, ...): the
  *     partitioning, batching, schema, and typed-Dataset plumbing
  *     around it are identical to the PNG/WAV paths.
  */
object MultimodalPipeline {

  /** An opaque media payload: bytes + source id. */
  case class MediaItem(doc_id: Long, payload: Array[Byte])

  /** Decoded metadata (what a real codec would emit). */
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long)

  /** A synthesized PNG payload keyed by document. */
  case class PngImage(doc_id: Long, png: Array[Byte])

  /** Exact pixel statistics from a REAL decode of the PNG payload. */
  case class PixelStats(
      doc_id: Long,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** Deterministic per-pixel RGB — the formula BOTH sides compute: the
    * Spark side draws it into a PNG and reads it back through the
    * codec; the DuckDB oracle evaluates it arithmetically. PNG is
    * lossless, so any codec misbehavior (channel order, row stride,
    * color management) breaks the hash match.
    */
  private def synthRgb(docId: Long, x: Int, y: Int): Int = {
    val r = ((x * 31 + y * 17 + docId) % 256).toInt
    val g = ((x * 7 + y * 29 + docId * 3) % 256).toInt
    val b = ((x * 13 + y * 5 + docId * 7) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Image dimensions derived from the doc id (4–16 × 3–9 px). */
  private def synthDims(docId: Long): (Int, Int) =
    ((docId % 13 + 4).toInt, (docId % 7 + 3).toInt)

  /** Per-partition PNG ENCODE: one reusable output buffer per
    * partition, one `javax.imageio` writer call per row.
    */
  def encodePngPartition(ids: Iterator[Long]): Iterator[PngImage] = {
    val bos = new java.io.ByteArrayOutputStream(1024)
    ids.map { docId =>
      val (w, h) = synthDims(docId)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, synthRgb(docId, x, y)); x += 1 }
        y += 1
      }
      bos.reset()
      javax.imageio.ImageIO.write(img, "png", bos)
      PngImage(docId, bos.toByteArray)
    }
  }

  /** Decode one PNG payload, failing loudly on undecodable bytes —
    * the single decode entry point every image consumer shares.
    * `what` localizes the failure (e.g. which video frame).
    */
  private def readPng(
      docId: Long,
      bytes: Array[Byte],
      what: String = "PNG payload"): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable $what for doc $docId")
    img
  }

  /** Exact per-channel pixel sums over a whole decoded image. */
  private def rgbSums(
      img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff
        sg += (p >> 8) & 0xff
        sb += p & 0xff
        x += 1
      }
      y += 1
    }
    (sr, sg, sb)
  }

  /** Per-partition REAL PNG decode via `javax.imageio`: reads the
    * binary payload back into pixels and reduces to exact per-channel
    * sums — streaming over the iterator, one decoded image in memory
    * at a time.
    */
  def decodePngPartition(items: Iterator[PngImage]): Iterator[PixelStats] =
    items.map { item =>
      val img = readPng(item.doc_id, item.png)
      val (sr, sg, sb) = rgbSums(img)
      PixelStats(item.doc_id, img.getWidth, img.getHeight, sr, sg, sb)
    }

  /** Synthesize-then-decode over the documents table: the binary
    * column is born and consumed executor-side (never on the driver),
    * through the same typed mapPartitions shape as [[decodeDocuments]].
    */
  def decodePngStats(spark: SparkSession, dir: String): Dataset[PixelStats] = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(encodePngPartition _)
      .mapPartitions(decodePngPartition _)
  }

  /** One 8-bin R-channel histogram row per (image, bin) from a REAL
    * decode — ALL 8 bins emitted (zeros included) so the downstream
    * pair join on the bin key sees every coordinate of the L1
    * distance, never just the intersection.
    */
  case class HistRow(doc_id: Long, bin: Int, c: Long, npix: Long)

  def histogramPartition(items: Iterator[PngImage]): Iterator[HistRow] =
    items.flatMap { item =>
      val img = readPng(item.doc_id, item.png)
      val (w, h) = (img.getWidth, img.getHeight)
      val bins = new Array[Long](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          bins(((img.getRGB(x, y) >> 16) & 0xff) / 32) += 1
          x += 1
        }
        y += 1
      }
      val np = w.toLong * h
      (0 until 8).iterator.map(b => HistRow(item.doc_id, b, bins(b), np))
    }

  def imageHistograms(
      spark: SparkSession, dir: String): Dataset[HistRow] = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(encodePngPartition _)
      .mapPartitions(histogramPartition _)
  }

  /** FULL-corpus twin of [[imageHistograms]] — no eval-sample cap.
    * This is the scale-path candidate source for `image_hist_lsh`:
    * downstream consumers bucket on quantized-histogram band keys,
    * never all-pairs, so the only per-row cost here is the one
    * decode pass (callers pin+memoize the frame so the codec runs
    * once per (session, dir) across all consumers and self-joins).
    */
  def imageHistogramsAll(
      spark: SparkSession, dir: String): Dataset[HistRow] = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(encodePngPartition _)
      .mapPartitions(histogramPartition _)
  }

  /** CLUSTERED-PALETTE eval corpus parameters: cluster `c` fixes the
    * two occupied histogram bins (a palette); variant `v` sets the
    * pixel-mass shift `m` between them — v<4 are PERTURBED NEAR-DUPS
    * (m differs by ≤3 of 128 pixels, ~2% mass, well inside the 100‰
    * L1 threshold), v≥4 are same-palette non-dups (m steps of 8, 6.3%
    * each — adjacent steps already exceed the threshold). This is the
    * corpus that makes `image_hist_eval` recall MEAN something: the
    * default synthRgb images are pseudo-uniform, so every band bucket
    * is palette-degenerate and the cap poisons the lot (the round-11
    * 21.8% "recall" was a fixture artifact, not an LSH property).
    * Returns (cluster, variant, shift).
    */
  private[operators] def evalParams(docId: Long): (Int, Int, Int) = {
    val c = (docId % 20).toInt
    val v = (docId / 20).toInt
    val m = if (v < 4) v + 1 + (c % 2) else 16 + 8 * (v - 4)
    (c, v, m)
  }

  /** Eval images are a fixed 16×8: pixel index p occupies bin
    * b0 = c%8 while p < 96−m, else bin b1 = (c+3)%8; the R value is
    * 32·bin + (7p + docId) mod 32 (stays inside its bin), G/B are
    * filler. All integer arithmetic, so the DuckDB oracle replays the
    * exact histogram without a codec while the Spark side derives it
    * from REAL decoded pixels.
    */
  def encodeEvalPngPartition(ids: Iterator[Long]): Iterator[PngImage] = {
    val bos = new java.io.ByteArrayOutputStream(1024)
    ids.map { docId =>
      val (c, _, m) = evalParams(docId)
      val b0 = c % 8
      val b1 = (c + 3) % 8
      val img = new java.awt.image.BufferedImage(
        16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var p = 0
      while (p < 128) {
        val bin = if (p < 96 - m) b0 else b1
        val r = 32 * bin + ((p * 7 + docId) % 32).toInt
        val g = ((p * 3 + docId) % 256).toInt
        val b = ((p * 11 + docId * 5) % 256).toInt
        img.setRGB(p % 16, p / 16, (r << 16) | (g << 8) | b)
        p += 1
      }
      bos.reset()
      javax.imageio.ImageIO.write(img, "png", bos)
      PngImage(docId, bos.toByteArray)
    }
  }

  /** Histograms over the 200-image eval corpus (REAL PNG round trip,
    * same decode+histogram path production uses) — the bounded sample
    * `image_hist_eval` scores the banded candidate generator on.
    */
  def imageHistogramsEval(
      spark: SparkSession, dir: String): Dataset[HistRow] = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .filter(col("doc_id") < 200)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(encodeEvalPngPartition _)
      .mapPartitions(histogramPartition _)
  }

  /** Nearest-neighbor resize statistics from a REAL decode: the 4×3
    * thumbnail's per-channel sums.
    */
  case class ResizeStats(
      doc_id: Long,
      src_w: Int,
      src_h: Int,
      thumb_sum_r: Long,
      thumb_sum_g: Long,
      thumb_sum_b: Long)

  /** Per-partition decode + nearest-neighbor RESIZE to a fixed 4×3
    * thumbnail — the feature-extraction access pattern over image
    * columns (downsample before embedding). Target pixel (tx, ty)
    * samples source pixel (⌊tx·w/4⌋, ⌊ty·h/3⌋) — pure integer
    * arithmetic, so the oracle recomputes the sampled coordinates
    * exactly.
    */
  def resizePartition(items: Iterator[PngImage]): Iterator[ResizeStats] =
    items.map { item =>
      val img = readPng(item.doc_id, item.png)
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var ty = 0
      while (ty < 3) {
        var tx = 0
        while (tx < 4) {
          val p = img.getRGB(tx * w / 4, ty * h / 3)
          sr += (p >> 16) & 0xff
          sg += (p >> 8) & 0xff
          sb += p & 0xff
          tx += 1
        }
        ty += 1
      }
      ResizeStats(item.doc_id, w, h, sr, sg, sb)
    }

  /** Synthesize → decode → resize over documents, same typed
    * mapPartitions shape as [[decodePngStats]].
    */
  def resizeStats(spark: SparkSession, dir: String): Dataset[ResizeStats] = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(encodePngPartition _)
      .mapPartitions(resizePartition _)
  }

  /** The 4×3 thumbnail as a 36-dim feature vector — the cheap image
    * embedding the cross-modal ANN path (`multimodal_ann`) searches
    * over. Dim order: (ty·4 + tx)·3 + channel, channels R,G,B.
    */
  case class ThumbFeature(doc_id: Long, feature: Array[Float])

  /** Per-partition decode + resize into the feature vector — the same
    * really-decoded 4×3 nearest-neighbor sample as [[resizePartition]],
    * kept per-pixel instead of summed.
    */
  def thumbFeaturePartition(
      items: Iterator[PngImage]): Iterator[ThumbFeature] =
    items.map { item =>
      val img = readPng(item.doc_id, item.png)
      val (w, h) = (img.getWidth, img.getHeight)
      val arr = new Array[Float](36)
      var ty = 0
      while (ty < 3) {
        var tx = 0
        while (tx < 4) {
          val p = img.getRGB(tx * w / 4, ty * h / 3)
          val base = (ty * 4 + tx) * 3
          arr(base) = ((p >> 16) & 0xff).toFloat
          arr(base + 1) = ((p >> 8) & 0xff).toFloat
          arr(base + 2) = (p & 0xff).toFloat
          tx += 1
        }
        ty += 1
      }
      ThumbFeature(item.doc_id, arr)
    }

  /** Synthesize → decode → featurize over documents, same typed
    * mapPartitions shape as [[decodePngStats]]. `maxDocId` bounds the
    * id scan BEFORE the codec: a filter written after a typed
    * mapPartitions cannot push through it, so a 5-query probe side
    * would otherwise decode the whole corpus — the filter must sit on
    * the parquet scan (PushedFilters), and with it the codec runs
    * only over the rows that survive.
    */
  def thumbFeatures(
      spark: SparkSession,
      dir: String,
      maxDocId: Option[Long] = None): Dataset[ThumbFeature] = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).select(col("doc_id"))
    maxDocId.fold(ids)(m => ids.filter(col("doc_id") < m))
      .as[Long]
      .mapPartitions(encodePngPartition _)
      .mapPartitions(thumbFeaturePartition _)
  }

  /** A synthesized WAV payload keyed by document. */
  case class WavClip(doc_id: Long, wav: Array[Byte])

  /** Decoded audio statistics from a REAL `javax.sound.sampled`
    * decode of the WAV payload.
    */
  case class AudioStats(
      doc_id: Long,
      n_frames: Long,
      sample_rate: Int,
      bits: Int,
      sum_samples: Long,
      max_sample: Int)

  /** Deterministic PCM sample formula shared with the oracle. */
  private def synthSample(docId: Long, i: Int): Int =
    ((i * 37 + docId * 13 + 11) % 256).toInt

  private def synthFrames(docId: Long): Int = (docId % 50 + 20).toInt

  /** Per-partition WAV ENCODE: 8-bit unsigned mono PCM at 8 kHz,
    * samples from the shared formula, container written by the stock
    * JVM's `javax.sound.sampled` — a real audio codec, no native
    * libraries.
    */
  def encodeWavPartition(ids: Iterator[Long]): Iterator[WavClip] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val bos = new java.io.ByteArrayOutputStream(1024)
    ids.map { docId =>
      val n = synthFrames(docId)
      val samples = Array.tabulate(n)(i => synthSample(docId, i).toByte)
      bos.reset()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(samples), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE,
        bos)
      WavClip(docId, bos.toByteArray)
    }
  }

  /** Per-partition REAL WAV decode: header parsed by the codec (frame
    * count, rate, depth recovered from the container, not assumed),
    * PCM samples reduced to exact sums — lossless, so the arithmetic
    * oracle pins the whole round trip.
    */
  def decodeWavPartition(items: Iterator[WavClip]): Iterator[AudioStats] =
    items.map { item =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(item.wav))
      try {
        val fmt = in.getFormat
        val pcm = in.readAllBytes()
        var (sum, maxS) = (0L, 0)
        pcm.foreach { b =>
          val v = b & 0xff
          sum += v
          if (v > maxS) maxS = v
        }
        AudioStats(
          item.doc_id,
          in.getFrameLength,
          fmt.getSampleRate.toInt,
          fmt.getSampleSizeInBits,
          sum,
          maxS)
      } finally in.close()
    }

  /** Per-document audio SIGNATURE windows: the really-decoded PCM
    * stream reduced to 16 interleaved window sums (sample i feeds
    * window i mod 16) — the energy-band fingerprint input for
    * audio near-dup. Interleaving makes the 16 windows length-
    * independent (every clip has >= 20 samples, so all windows are
    * populated at any duration), and every sum is exact integer
    * arithmetic on decoded bytes, so the oracle rebuilds the
    * signature from the sample formula.
    */
  case class AudioWindows(doc_id: Long, wsums: Array[Long])

  def decodeWavWindowsPartition(
      items: Iterator[WavClip]): Iterator[AudioWindows] =
    items.map { item =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(item.wav))
      try {
        val pcm = in.readAllBytes()
        val sums = new Array[Long](16)
        var i = 0
        while (i < pcm.length) {
          sums(i % 16) += (pcm(i) & 0xff)
          i += 1
        }
        AudioWindows(item.doc_id, sums)
      } finally in.close()
    }

  /** Synthesize → decode → window signature over documents. */
  def audioWindowSums(
      spark: SparkSession, dir: String): Dataset[AudioWindows] = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(encodeWavPartition _)
      .mapPartitions(decodeWavWindowsPartition _)
  }

  /** Synthesize → decode over documents for the audio column. */
  def audioStats(spark: SparkSession, dir: String): Dataset[AudioStats] = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(encodeWavPartition _)
      .mapPartitions(decodeWavPartition _)
  }

  /** A synthesized multi-frame video payload keyed by document. */
  case class VideoClip(doc_id: Long, video: Array[Byte])

  /** Exact pixel statistics for one SAMPLED, really-decoded frame. */
  case class FrameStats(
      doc_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** Per-frame pixel formula (frame index shifts every channel). */
  private def synthFrameRgb(docId: Long, f: Int, x: Int, y: Int): Int = {
    val r = ((x * 31 + y * 17 + docId + f * 101) % 256).toInt
    val g = ((x * 7 + y * 29 + docId * 3 + f * 59) % 256).toInt
    val b = ((x * 13 + y * 5 + docId * 7 + f * 23) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  private def synthFrameCount(docId: Long): Int = (docId % 4 + 2).toInt

  /** Per-partition VIDEO encode: a length-prefixed container of PNG
    * frames (4-byte frame count, then per frame 4-byte length + PNG
    * bytes). The JVM ships no video demuxer, so the CONTAINER is ours
    * — but every frame goes through the real `javax.imageio` codec,
    * which is the part a fake could fudge.
    */
  def encodeVideoPartition(ids: Iterator[Long]): Iterator[VideoClip] = {
    val frameBuf = new java.io.ByteArrayOutputStream(1024)
    ids.map { docId =>
      val (w, h) = synthDims(docId)
      val bos = new java.io.ByteArrayOutputStream(4096)
      val out = new java.io.DataOutputStream(bos)
      val n = synthFrameCount(docId)
      out.writeInt(n)
      var f = 0
      while (f < n) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, synthFrameRgb(docId, f, x, y)); x += 1
          }
          y += 1
        }
        frameBuf.reset()
        javax.imageio.ImageIO.write(img, "png", frameBuf)
        out.writeInt(frameBuf.size())
        frameBuf.writeTo(out)
        f += 1
      }
      out.flush()
      VideoClip(docId, bos.toByteArray)
    }
  }

  /** Per-partition frame SAMPLING with a REAL per-frame decode: demux
    * the container, decode every `stride`-th frame through
    * `javax.imageio`, and SKIP the rest without decoding — the access
    * pattern that makes frame sampling cheap on real video (seek past
    * undecoded frames, never inflate them).
    */
  def sampleFramesPartition(
      items: Iterator[VideoClip], stride: Int = 2): Iterator[FrameStats] =
    items.flatMap { clip =>
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(clip.video))
      val n = in.readInt()
      (0 until n).flatMap { f =>
        val len = in.readInt()
        if (f % stride != 0) { in.skipNBytes(len.toLong); None }
        else {
          val frame = new Array[Byte](len)
          in.readFully(frame)
          val img = readPng(clip.doc_id, frame, s"frame $f")
          val (sr, sg, sb) = rgbSums(img)
          Some(FrameStats(
            clip.doc_id, f, img.getWidth, img.getHeight, sr, sg, sb))
        }
      }
    }

  /** Synthesize → demux+sample over documents for the video column. */
  def videoFrameStats(
      spark: SparkSession, dir: String): Dataset[FrameStats] = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(encodeVideoPartition _)
      .mapPartitions(items => sampleFramesPartition(items))
  }

  /** STUB decode: deterministic fake. A real implementation opens the
    * codec handle created in [[decodePartition]] and reads headers.
    */
  def decodeStub(item: MediaItem): MediaMeta = {
    val n = item.payload.length
    // cheap deterministic byte checksum (sum of unsigned bytes)
    var sum = 0L
    var i = 0
    while (i < n) { sum += item.payload(i) & 0xff; i += 1 }
    MediaMeta(
      doc_id = item.doc_id,
      n_bytes = n,
      width = n % 640 + 1,
      height = n % 480 + 1,
      n_frames = n / 100 + 1,
      checksum = sum)
  }

  /** Per-partition decode: ONE codec init per partition (the expensive
    * part with real codecs), then a streaming map over the iterator —
    * never materializes the partition in memory.
    */
  def decodePartition(items: Iterator[MediaItem]): Iterator[MediaMeta] = {
    // val codec = Codec.open(...)   <- real codec init would go here
    items.map(decodeStub)
  }

  /** documents.text re-encoded as opaque payload bytes (stand-in for a
    * real media column), decoded via mapPartitions.
    */
  def decodeDocuments(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaItem]
      .mapPartitions(decodePartition _)
  }
}
