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
}
