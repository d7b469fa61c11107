package graft.sources

import java.util

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `eventreplay` streaming DataSourceV2: a MicroBatchStream over a
  * staged event log with REAL offset management — the message-bus
  * shape (Kafka-like) that the file-source streaming queries can't
  * exercise: offsets are per-partition positions in a durable log,
  * each micro-batch is an exact [start, end) slice per partition,
  * admission control splits a row budget across the partitions, and a
  * restarted query resumes EVERY partition from the position the
  * checkpoint committed — never from zero, never replaying delivered
  * rows.
  *
  * The log here is one TSV file per log partition (one event per
  * line: event_id \t ts_us \t user_id \t event_type \t value_cents)
  * because the environment has no broker; the offset/commit/restart
  * contract is the part under test and is identical to a
  * broker-backed source. The offset is the broker shape — a
  * `{partition → position}` JSON map, one InputPartition per log
  * partition, per-partition admission control — so at 100 TB/day the
  * only change is inside the reader: a seekable log store (Kafka
  * partitions, a WAL segment store) replaces the line-skip
  * positioning. Everything above the reader — budget allocation,
  * offset arithmetic, checkpoint recovery, the AvailableNow freeze —
  * is already the deployable shape.
  *
  * Options (case-insensitive, like every DSV2 source):
  *   - `path`: a single-partition log (one staged file), OR
  *   - `paths`: comma-separated files, one log partition per file
  *     (partition i = i-th path);
  *   - `rowsPerBatch` (default 5000): admission-control cap per
  *     micro-batch ACROSS all partitions ([[ReadLimit.maxRows]]);
  *     the budget is split proportionally to per-partition backlog.
  *   - `maxRows` / `maxRowsPerPartition` (optional): pretend each log
  *     partition ends after N rows — the gates use it to simulate a
  *     mid-stream kill deterministically (phase 1 sees half of every
  *     partition, dies; phase 2 sees it all and must resume each
  *     partition from its committed position).
  */
class EventReplayDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventReplayDataSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DSV2 option maps are case-insensitive everywhere else; honor
    // that here too (an option spelled `rowsperbatch` must not be
    // silently ignored).
    val opts = new CaseInsensitiveStringMap(properties)
    val paths =
      Option(opts.get("paths"))
        .map(_.split(',').toIndexedSeq.map(_.trim).filter(_.nonEmpty))
        .orElse(Option(opts.get("path")).map(p => IndexedSeq(p)))
        .getOrElse(throw new IllegalArgumentException(
          "eventreplay source: option 'path' or 'paths' is required"))
    val horizon =
      Option(opts.get("maxRowsPerPartition"))
        .orElse(Option(opts.get("maxRows")))
        .map(_.toLong)
    new EventReplayTable(
      paths,
      Option(opts.get("rowsPerBatch")).map(_.toLong).getOrElse(5000L),
      horizon)
  }
}

object EventReplayDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value_cents", LongType)))

  /** Task count when slicing a SINGLE-partition micro-batch's row
    * range — mirrors a broker source's partition fan-out so the
    * per-batch plan is multi-task like production. Multi-partition
    * logs instead get the broker mapping itself: one task per log
    * partition.
    */
  val SplitsPerBatch = 4

  /** Number of broker-provenance metadata columns the reader appends
    * after every base row (`_replay_part`, `_replay_pos`). The reader
    * asserts its emitted arity against Schema.length + this, so a
    * schema or metadata-column change that forgets the other side
    * fails loudly instead of silently misaligning the positional
    * metadata binding.
    */
  val MetadataFieldCount = 2

}

class EventReplayTable(
    paths: IndexedSeq[String], rowsPerBatch: Long, maxRows: Option[Long])
    extends Table
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  /** Broker-provenance METADATA COLUMNS (the Kafka partition/offset
    * shape): `_replay_part` = log partition index, `_replay_pos` =
    * the row's 0-based position within its partition — hidden until
    * a query names them, served by the reader from the slice bounds
    * it already carries (zero extra I/O). The streaming plan binds a
    * referenced metadata column POSITIONALLY at dataSchema.length +
    * its declared index (streaming scans run no column pruning), so
    * the reader always appends both in declaration order; a query
    * that references neither never reads past the base fields.
    */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_replay_part"
        override def dataType(): org.apache.spark.sql.types.DataType =
          IntegerType
        override def comment(): String = "log partition index"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_replay_pos"
        override def dataType(): org.apache.spark.sql.types.DataType =
          LongType
        override def comment(): String =
          "0-based row position within the log partition"
      })
  override def name(): String = s"eventreplay(${paths.mkString(",")})"
  override def schema(): StructType = EventReplayDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType =
          EventReplayDataSource.Schema
        override def toMicroBatchStream(
            checkpointLocation: String): MicroBatchStream =
          new EventReplayMicroBatchStream(paths, rowsPerBatch, maxRows)
        override def description(): String =
          s"eventreplay [paths=${paths.mkString(",")}, " +
            s"rowsPerBatch=$rowsPerBatch" +
            maxRows.map(m => s", maxRowsPerPartition=$m]").getOrElse("]")
      }
    }
}

/** Composite offset: for each log partition, the number of rows
  * already delivered from it (the position AFTER the last served
  * row) — the broker offset shape. Serialized as a `{"0":n0,"1":n1}`
  * JSON map in the checkpoint offset log (partition id → position),
  * exactly how the Kafka source records its per-TopicPartition
  * offsets.
  */
case class EventReplayOffset(positions: IndexedSeq[Long]) extends Offset {
  override def json(): String =
    positions.zipWithIndex
      .map { case (p, i) => s""""$i":$p""" }
      .mkString("{", ",", "}")
}

object EventReplayOffset {
  def zero(nParts: Int): EventReplayOffset =
    EventReplayOffset(IndexedSeq.fill(nParts)(0L))

  /** Parse either the composite `{"0":n,...}` form or the round-9
    * scalar form (a bare decimal — a single-partition checkpoint
    * written before offsets grew the partition dimension).
    */
  def parse(json: String, nParts: Int): EventReplayOffset = {
    val t = json.trim
    if (t.startsWith("{")) {
      import org.json4s._
      implicit val formats: Formats = DefaultFormats
      val m = org.json4s.jackson.JsonMethods.parse(t)
        .extract[Map[String, Long]]
        .map { case (k, v) => k.toInt -> v }
      require(m.keySet == (0 until nParts).toSet,
        s"eventreplay offset $t does not cover partitions 0..${nParts - 1}")
      EventReplayOffset((0 until nParts).map(m))
    } else {
      require(nParts == 1,
        s"scalar offset '$t' is only valid for a single-partition log")
      EventReplayOffset(IndexedSeq(t.toLong))
    }
  }
}

/** The admission-control budget split, as a pure function so its
  * invariants are property-testable ([[graft.EventReplayPropsSpec]]).
  */
object EventReplayAdmission {

  /** Split a row budget across partitions proportionally to backlog
    * (the Kafka source's rate-limit allocation): each partition gets
    * floor(budget × backlog_i / total), and the remainder is handed
    * out one row at a time in partition order to partitions with
    * headroom — deterministic, sums to min(budget, total backlog),
    * never exceeds any partition's backlog.
    */
  def allocate(
      starts: IndexedSeq[Long], ends: IndexedSeq[Long],
      budget: Long): IndexedSeq[Long] = {
    val n = starts.length
    val avail = (0 until n).map(i => math.max(0L, ends(i) - starts(i)))
    val total = avail.sum
    val budget0 = math.max(0L, budget)
    if (total <= budget0) avail
    else {
      val base = avail.map(a => budget0 * a / total)
      var left = budget0 - base.sum
      val out = base.toArray
      var i = 0
      while (left > 0) {
        if (out(i) < avail(i)) { out(i) += 1; left -= 1 }
        i = (i + 1) % n
      }
      out.toIndexedSeq
    }
  }
}

class EventReplayMicroBatchStream(
    paths: IndexedSeq[String], rowsPerBatch: Long, maxRows: Option[Long])
    extends MicroBatchStream
    with SupportsAdmissionControl
    with SupportsTriggerAvailableNow
    with Logging {

  private val nParts = paths.length

  /** (file size → line count) memo per partition: the visible head of
    * a GROWING log must advance between micro-batches (a broker is
    * asked for end offsets every batch), but re-counting an unchanged
    * file every batch is waste. Size is the cheap change detector for
    * an append-only log.
    */
  private val headCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]

  /** Current end of the visible log, per partition: line count (re-
    * checked each call so a growing log is followed), capped by the
    * simulated-kill horizon.
    */
  private def logEnds: IndexedSeq[Long] =
    paths.indices.map { i =>
      val p = java.nio.file.Paths.get(paths(i))
      val size = java.nio.file.Files.size(p)
      val n = headCache.compute(i, (_, prev) =>
        if (prev != null && prev._1 == size) prev
        else {
          val lines = java.nio.file.Files.lines(p)
          val c = try lines.count() finally lines.close()
          (size, c)
        })._2
      maxRows.map(math.min(_, n)).getOrElse(n)
    }

  /** Trigger.AvailableNow drain target, captured EXPLICITLY by
    * [[prepareForTriggerAvailableNow]] (the Kafka source's
    * `allDataForTriggerAvailableNow` field). When set, latestOffset /
    * reportLatestOffset are capped at it, so rows appended to the log
    * after query start are NOT drained — the AvailableNow contract is
    * "all data available at the start of the query", and relying on a
    * lazy-val side effect to freeze the head would break the moment
    * the log grows mid-run.
    */
  @volatile private var availableNowEnds: Option[IndexedSeq[Long]] = None

  private def visibleEnds: IndexedSeq[Long] =
    availableNowEnds.getOrElse(logEnds)

  override def initialOffset(): Offset = EventReplayOffset.zero(nParts)

  override def deserializeOffset(json: String): Offset =
    EventReplayOffset.parse(json, nParts)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(rowsPerBatch)

  // Admission-control sources get the (start, limit) overload; the
  // legacy no-arg form must never be called.
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "eventreplay implements SupportsAdmissionControl — " +
        "latestOffset(start, limit) is the entry point")

  /** Extract the row budget from the ReadLimit: the direct maxRows
    * cap, the maxRows component of a composite limit (the Kafka
    * pattern — Spark sends CompositeReadLimit when e.g. minRows and
    * maxRows are both configured), or no cap for ReadAllAvailable.
    */
  private def rowBudget(limit: ReadLimit): Option[Long] = limit match {
    case m: ReadMaxRows => Some(m.maxRows())
    case c: CompositeReadLimit =>
      c.getReadLimits.collectFirst { case m: ReadMaxRows => m.maxRows() }
    case _: ReadAllAvailable => None
    case _ => None // ReadMinRows etc.: no upper cap
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[EventReplayOffset].positions
    val ends = visibleEnds
    val next = rowBudget(limit) match {
      case Some(budget) =>
        val alloc = EventReplayAdmission.allocate(s, ends, budget)
        paths.indices.map(i => s(i) + alloc(i))
      case None => ends
    }
    EventReplayOffset(next)
  }

  /** True head of the log, ignoring rate limits (but respecting the
    * AvailableNow freeze — progress reporting must not show a target
    * the run will never drain to).
    */
  override def reportLatestOffset(): Offset =
    EventReplayOffset(visibleEnds)

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
    val ends = logEnds
    availableNowEnds = Some(ends)
    logInfo("eventreplay available-now run will drain to " +
      EventReplayOffset(ends).json())
  }

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EventReplayOffset].positions
    val e = end.asInstanceOf[EventReplayOffset].positions
    if (nParts == 1) {
      // Single-partition log: sub-split the slice so the per-batch
      // plan is multi-task (a stand-in for broker partition fan-out).
      val (lo0, hi0) = (s(0), e(0))
      if (hi0 <= lo0) Array.empty
      else {
        val n = math.min(
          EventReplayDataSource.SplitsPerBatch.toLong, hi0 - lo0).toInt
        val step = (hi0 - lo0) / n
        (0 until n).map { i =>
          val lo = lo0 + i * step
          val hi = if (i == n - 1) hi0 else lo + step
          EventReplayInputPartition(paths(0), lo, hi, 0)
            : InputPartition
        }.toArray
      }
    } else {
      // Broker mapping: one task per log partition with a non-empty
      // slice, each reading only its own file.
      paths.indices
        .filter(i => e(i) > s(i))
        .map(i =>
          EventReplayInputPartition(paths(i), s(i), e(i), i)
            : InputPartition)
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EventReplayReaderFactory

  override def commit(end: Offset): Unit =
    logInfo(s"eventreplay committed through offset ${end.json()}")

  override def stop(): Unit = ()
}

case class EventReplayInputPartition(
    path: String, startRow: Long, endRow: Long, partIdx: Int)
    extends InputPartition

class EventReplayReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EventReplayInputPartition]
    new EventReplayReader(p.path, p.startRow, p.endRow, p.partIdx)
  }
}

/** Sparse line→byte-offset index of a log-partition file: byte
  * position of every [[Stride]]-th line start, built in ONE raw byte
  * scan and memoized per (path, size) in the executor JVM. This is
  * the log store's SEEK INDEX: without it every micro-batch re-skips
  * from byte zero, O(position) per batch and O(log²) over a full
  * drain; with it positioning is one seek plus at most Stride−1 line
  * reads, amortized O(log) once per file per executor. The (path,
  * size) key re-indexes an append-only log automatically when it
  * grows (same key discipline as the stream's visible-head memo).
  */
object EventReplayLineIndex {
  val Stride = 1024

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Array[Long]]

  /** Byte offsets of line starts 0, Stride, 2·Stride, … (offset 0 is
    * always present; newline bytes are unambiguous in UTF-8).
    */
  def offsets(path: String): Array[Long] = {
    val size = java.nio.file.Files.size(java.nio.file.Paths.get(path))
    cache.computeIfAbsent((path, size), _ => {
      val out = scala.collection.mutable.ArrayBuffer(0L)
      val in = java.nio.file.Files.newInputStream(
        java.nio.file.Paths.get(path))
      try {
        val buf = new Array[Byte](1 << 16)
        var bytePos = 0L
        var line = 0L
        var n = in.read(buf)
        while (n > 0) {
          var i = 0
          while (i < n) {
            if (buf(i) == '\n') {
              line += 1
              if (line % Stride == 0) out += bytePos + i + 1
            }
            i += 1
          }
          bytePos += n
          n = in.read(buf)
        }
      } finally in.close()
      out.toArray
    })
  }
}

/** Serves log rows [startRow, endRow) of one log-partition file as
  * InternalRows. Positioning is a seek through the memoized
  * [[EventReplayLineIndex]] (nearest indexed line start, then at most
  * Stride−1 line skips) — the seekable-log-store read path, not a
  * from-zero scan per batch.
  */
class EventReplayReader(
    path: String, startRow: Long, endRow: Long, partIdx: Int = 0)
    extends PartitionReader[InternalRow] {
  private val channel = java.nio.file.Files.newByteChannel(
    java.nio.file.Paths.get(path))
  private var pos = {
    val idx = EventReplayLineIndex.offsets(path)
    val slot = math.min(
      startRow / EventReplayLineIndex.Stride, idx.length - 1L).toInt
    channel.position(idx(slot))
    slot.toLong * EventReplayLineIndex.Stride
  }
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(
      java.nio.channels.Channels.newInputStream(channel),
      java.nio.charset.StandardCharsets.UTF_8))
  while (pos < startRow && reader.readLine() != null) pos += 1
  private var current: InternalRow = _

  override def next(): Boolean =
    if (pos >= endRow) false
    else {
      val line = reader.readLine()
      if (line == null) false
      else {
        val rowPos = pos
        pos += 1
        val f = line.split('\t')
        require(f.length == EventReplayDataSource.Schema.length,
          s"eventreplay: malformed log line (${f.length} fields): $line")
        val base: Seq[Any] = Seq(
          f(0).toLong,
          f(1).toLong,
          f(2).toLong,
          UTF8String.fromString(f(3)),
          f(4).toLong)
        // Broker-provenance metadata ALWAYS appends after the base
        // schema in metadataColumns() declaration order: the
        // STREAMING path never runs column pruning (this builder
        // implements no SupportsPushDownRequiredColumns, so Spark
        // CANNOT prune this scan), and Spark binds a referenced
        // metadata column positionally at dataSchema.length + its
        // declared index — a query that references none simply never
        // reads past position 4. HARD CONTRACT ASSERTION: emitted
        // arity must be base schema + declared metadata count; any
        // future batch-read support or schema change that breaks the
        // positional contract fails here instead of misaligning
        // columns silently.
        val out = base :+ partIdx :+ rowPos
        assert(
          out.length == EventReplayDataSource.Schema.length +
            EventReplayDataSource.MetadataFieldCount,
          s"eventreplay positional-binding contract broken: emitting " +
            s"${out.length} fields, expected " +
            s"${EventReplayDataSource.Schema.length} base + " +
            s"${EventReplayDataSource.MetadataFieldCount} metadata")
        current = InternalRow(out: _*)
        true
      }
    }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
