package graft.sources

import java.util

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `eventreplay` streaming DataSourceV2: a MicroBatchStream over a
  * staged event log with REAL offset management — the message-bus
  * shape (Kafka-like) that the file-source streaming queries can't
  * exercise: offsets are positions in a durable log, each micro-batch
  * is an exact [start, end) slice, admission control rate-limits the
  * slice size, and a restarted query resumes from the offset the
  * checkpoint committed — never from zero, never replaying delivered
  * rows.
  *
  * The log here is a TSV file (one event per line:
  * event_id \t ts_us \t user_id \t event_type \t value_cents) because
  * the environment has no broker; the offset/commit/restart contract
  * is the part under test and is identical to a broker-backed source.
  * At 100 TB/day the only changes are inside the reader: a seekable
  * log store (Kafka partitions, a WAL segment store) replaces the
  * line-skip positioning, and one InputPartition per log partition
  * replaces the row-range split. Everything above the reader —
  * admission control, offset arithmetic, checkpoint recovery — is
  * already the deployable shape.
  *
  * Options:
  *   - `path` (required): the staged log file.
  *   - `rowsPerBatch` (default 5000): admission-control cap per
  *     micro-batch ([[ReadLimit.maxRows]]).
  *   - `maxRows` (optional): pretend the log ends after N rows — the
  *     gate uses it to simulate a mid-stream kill deterministically
  *     (phase 1 sees half the log, dies; phase 2 sees it all and must
  *     resume from the committed offset).
  */
class EventReplayDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventReplayDataSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EventReplayTable(
      Option(properties.get("path")).getOrElse(
        throw new IllegalArgumentException(
          "eventreplay source: option 'path' is required")),
      Option(properties.get("rowsPerBatch")).map(_.toLong).getOrElse(5000L),
      Option(properties.get("maxRows")).map(_.toLong))
}

object EventReplayDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value_cents", LongType)))

  /** Target partition count when slicing one micro-batch's row range —
    * mirrors a broker source's partition fan-out so the per-batch plan
    * is multi-task like production, while staying small enough that
    * tiny batches don't drown in task overhead.
    */
  val SplitsPerBatch = 4
}

class EventReplayTable(path: String, rowsPerBatch: Long, maxRows: Option[Long])
    extends Table
    with SupportsRead {
  override def name(): String = s"eventreplay($path)"
  override def schema(): StructType = EventReplayDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = EventReplayDataSource.Schema
        override def toMicroBatchStream(
            checkpointLocation: String): MicroBatchStream =
          new EventReplayMicroBatchStream(path, rowsPerBatch, maxRows)
        override def description(): String =
          s"eventreplay [path=$path, rowsPerBatch=$rowsPerBatch" +
            maxRows.map(m => s", maxRows=$m]").getOrElse("]")
      }
    }
}

/** Offset = number of log rows already delivered (the position AFTER
  * the last served row). Serialized as its decimal string in the
  * checkpoint offset log.
  */
case class EventReplayOffset(row: Long) extends Offset {
  override def json(): String = row.toString
}

class EventReplayMicroBatchStream(
    path: String, rowsPerBatch: Long, maxRows: Option[Long])
    extends MicroBatchStream
    with SupportsAdmissionControl
    with SupportsTriggerAvailableNow
    with Logging {

  /** End of the visible log: line count, capped by the simulated-kill
    * option. Counted once per stream instantiation (a broker source
    * asks the cluster for end offsets the same way).
    */
  private lazy val endOfLog: Long = {
    val lines = java.nio.file.Files.lines(java.nio.file.Paths.get(path))
    val n = try lines.count() finally lines.close()
    maxRows.map(math.min(_, n)).getOrElse(n)
  }

  override def initialOffset(): Offset = EventReplayOffset(0L)

  override def deserializeOffset(json: String): Offset =
    EventReplayOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(rowsPerBatch)

  // Admission-control sources get the (start, limit) overload; the
  // legacy no-arg form must never be called.
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "eventreplay implements SupportsAdmissionControl — " +
        "latestOffset(start, limit) is the entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[EventReplayOffset].row
    val cap = limit match {
      case m: ReadMaxRows => s + m.maxRows()
      case _ => endOfLog
    }
    EventReplayOffset(math.min(cap, endOfLog))
  }

  /** True head of the log, ignoring rate limits. */
  override def reportLatestOffset(): Offset = EventReplayOffset(endOfLog)

  /** Trigger.AvailableNow contract, implemented NATIVELY (the Kafka
    * source's shape): freeze the drain target once at query start;
    * each micro-batch still advances by the admission-control cap, so
    * the run is SEVERAL rate-limited batches ending exactly at the
    * frozen head. Without this, Spark's generic wrapper
    * (AvailableNowDataStreamWrapper.latestOffset = fetchedOffset)
    * would drain everything in one giant batch — at 100 TB/day that
    * is the difference between bounded micro-batch memory and an
    * unbounded one-shot read.
    */
  override def prepareForTriggerAvailableNow(): Unit = {
    val head = endOfLog
    logInfo(s"eventreplay available-now run will drain to offset $head")
  }

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EventReplayOffset].row
    val e = end.asInstanceOf[EventReplayOffset].row
    if (e <= s) Array.empty
    else {
      val n = math.min(
        EventReplayDataSource.SplitsPerBatch.toLong, e - s).toInt
      val step = (e - s) / n
      (0 until n).map { i =>
        val lo = s + i * step
        val hi = if (i == n - 1) e else lo + step
        EventReplayInputPartition(lo, hi): InputPartition
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EventReplayReaderFactory(path)

  override def commit(end: Offset): Unit =
    logInfo(s"eventreplay committed through offset ${end.json()}")

  override def stop(): Unit = ()
}

case class EventReplayInputPartition(startRow: Long, endRow: Long)
    extends InputPartition

class EventReplayReaderFactory(path: String)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EventReplayInputPartition]
    new EventReplayReader(path, p.startRow, p.endRow)
  }
}

/** Serves log rows [startRow, endRow) as InternalRows. Positioning is
  * a line skip — O(offset) per partition, fine for a staged fixture
  * log; a production log store seeks by offset index instead (same
  * reader contract, different positioning cost).
  */
class EventReplayReader(path: String, startRow: Long, endRow: Long)
    extends PartitionReader[InternalRow] {
  private val reader =
    java.nio.file.Files.newBufferedReader(
      java.nio.file.Paths.get(path),
      java.nio.charset.StandardCharsets.UTF_8)
  private var pos = 0L
  while (pos < startRow && reader.readLine() != null) pos += 1
  private var current: InternalRow = _

  override def next(): Boolean =
    if (pos >= endRow) false
    else {
      val line = reader.readLine()
      if (line == null) false
      else {
        pos += 1
        val f = line.split('\t')
        require(f.length == 5,
          s"eventreplay: malformed log line (${f.length} fields): $line")
        current = InternalRow(
          f(0).toLong,
          f(1).toLong,
          f(2).toLong,
          UTF8String.fromString(f(3)),
          f(4).toLong)
        true
      }
    }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
