package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalPipeline

/** The typed per-partition decode plumbing: stub decode emits the same
  * metadata the expression-based multimodal_meta query derives, and the
  * pipeline stays distributed (no driver-side iteration).
  */
class MultimodalSpec extends SparkTestBase {

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
