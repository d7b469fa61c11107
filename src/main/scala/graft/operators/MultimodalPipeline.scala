package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed per-partition media decode plumbing — the Scala equivalent of
  * a `mapInPandas` decode stage: batch-shaped, executor-side, with
  * per-partition codec initialization amortized across the partition's
  * rows.
  *
  * The CODEC IS A STUB (this container ships no image/audio libraries):
  * `decodeStub` derives deterministic fake dimensions from the payload
  * bytes. Swapping it for a real codec changes ONE function — the
  * partitioning, batching, schema, and typed-Dataset plumbing around it
  * are the real, tested artifact.
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
