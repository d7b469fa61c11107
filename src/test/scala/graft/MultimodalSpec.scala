package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalPipeline

/** The typed per-partition decode plumbing: the REAL javax.imageio PNG
  * codec round-trips deterministic pixels exactly, the stub decode
  * emits the same metadata the expression-based multimodal_meta query
  * derives, and the pipeline stays distributed (no driver-side
  * iteration).
  */
class MultimodalSpec extends SparkTestBase {

  test("PNG encode→decode round trip recovers exact pixel statistics") {
    val stats = MultimodalPipeline
      .decodePngStats(spark, sfDir)
      .collect()
      .map(p => p.doc_id -> p)
      .toMap
    assert(stats.size == 500)
    stats.values.foreach { p =>
      // Dimensions come from the doc id; sums recomputed from the
      // shared pixel formula — the codec cannot shortcut this.
      assert(p.width == (p.doc_id % 13 + 4).toInt)
      assert(p.height == (p.doc_id % 7 + 3).toInt)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until p.height; x <- 0 until p.width) {
        sr += (x * 31 + y * 17 + p.doc_id) % 256
        sg += (x * 7 + y * 29 + p.doc_id * 3) % 256
        sb += (x * 13 + y * 5 + p.doc_id * 7) % 256
      }
      assert((p.sum_r, p.sum_g, p.sum_b) == ((sr, sg, sb)),
        s"pixel sums diverged for doc ${p.doc_id}")
    }
  }

  test("WAV encode→decode round trip recovers header and exact samples") {
    val stats = MultimodalPipeline
      .audioStats(spark, sfDir)
      .collect()
    assert(stats.length == 500)
    stats.foreach { a =>
      assert(a.sample_rate == 8000 && a.bits == 8)
      val n = (a.doc_id % 50 + 20).toInt
      assert(a.n_frames == n, s"frame count diverged for doc ${a.doc_id}")
      val samples = (0 until n).map(i => (i * 37 + a.doc_id * 13 + 11) % 256)
      assert(a.sum_samples == samples.sum)
      assert(a.max_sample == samples.max)
    }
  }

  test("nearest-neighbor resize samples exactly the expected pixels") {
    val stats = MultimodalPipeline
      .resizeStats(spark, sfDir)
      .collect()
    assert(stats.length == 500)
    stats.foreach { t =>
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (ty <- 0 until 3; tx <- 0 until 4) {
        val sx = tx * t.src_w / 4
        val sy = ty * t.src_h / 3
        sr += (sx * 31 + sy * 17 + t.doc_id) % 256
        sg += (sx * 7 + sy * 29 + t.doc_id * 3) % 256
        sb += (sx * 13 + sy * 5 + t.doc_id * 7) % 256
      }
      assert((t.thumb_sum_r, t.thumb_sum_g, t.thumb_sum_b) == ((sr, sg, sb)),
        s"thumbnail sums diverged for doc ${t.doc_id}")
    }
  }

  test("video demux decodes sampled frames exactly and skips the rest") {
    val frames = MultimodalPipeline
      .videoFrameStats(spark, sfDir)
      .collect()
    // Every doc contributes ceil(n/2) sampled frames, n = doc_id%4+2.
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.size == 500)
    byDoc.foreach { case (docId, fs) =>
      val n = (docId % 4 + 2).toInt
      assert(fs.map(_.frame_idx).sorted.toSeq ==
        (0 until n by 2).toSeq, s"sampled frame set wrong for doc $docId")
      fs.foreach { t =>
        var (sr, sg, sb) = (0L, 0L, 0L)
        for (y <- 0 until t.height; x <- 0 until t.width) {
          sr += (x * 31 + y * 17 + docId + t.frame_idx * 101) % 256
          sg += (x * 7 + y * 29 + docId * 3 + t.frame_idx * 59) % 256
          sb += (x * 13 + y * 5 + docId * 7 + t.frame_idx * 23) % 256
        }
        assert((t.sum_r, t.sum_g, t.sum_b) == ((sr, sg, sb)),
          s"frame sums diverged for doc $docId frame ${t.frame_idx}")
      }
    }
  }

  test("mapPartitions decode matches expression-derived metadata") {
    val decoded = MultimodalPipeline
      .decodeDocuments(spark, sfDir)
      .orderBy("doc_id")
      .collect()
    assert(decoded.length == 500)
    val expected = Tables
      .documents(spark, sfDir)
      .select(
        col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"))
      .orderBy("doc_id")
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    decoded.foreach { m =>
      assert(m.n_bytes == expected(m.doc_id))
      assert(m.width == m.n_bytes % 640 + 1)
      assert(m.height == m.n_bytes % 480 + 1)
      assert(m.n_frames == m.n_bytes / 100 + 1)
      assert(m.checksum > 0)
    }
  }

  test("image_hist_neardup: threshold honest, histograms conserve") {
    import org.apache.spark.sql.functions._
    val pairs = SparkEntry.queries("image_hist_neardup")(spark, sfDir)
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
      assert(r.getAs[Long]("l1num") * 10 <= r.getAs[Long]("den"))
      assert(r.getAs[Long]("l1_pm") <= 100L)
    }
    // Decoded histograms must conserve pixels: per image the 8 bins
    // sum to width·height.
    val hists = graft.operators.MultimodalPipeline
      .imageHistograms(spark, sfDir).toDF().collect()
    hists.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      assert(rs.length == 8, s"image $id missing bins")
      assert(rs.map(_.getAs[Long]("c")).sum ==
        rs.head.getAs[Long]("npix"),
        s"image $id histogram loses pixels")
    }
  }
}
