package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** MERGE-ON-READ row-level DML for kvjsonl tables (`TBLPROPERTIES
  * ('dml'='mor')`) — the DELTA-BASED protocol (`SupportsDelta`,
  * SPARK-35801), the Iceberg position-delete shape:
  *
  *   - the row ID is (`_file`, `_pos`) — the physical line address the
  *     scan already materializes as metadata columns;
  *   - DELETE writes one TOMBSTONE LINE per matched row into a
  *     positional delete file (`delete-<job>-<part>.del`, lines
  *     `dataFile<TAB>pos`) instead of rewriting the survivors'
  *     file groups — at 100 TB a 0.1% delete costs 0.1% tombstone
  *     writes, not a full-group rewrite (the copy-on-write debit
  *     VERDICT r13 named as the substrate's largest scale gap);
  *   - UPDATE / MERGE are represented as delete+insert
  *     (`representUpdateAsDeleteAndInsert`): tombstone the old
  *     address, append the new row to an ordinary data file;
  *   - the commit APPENDS both kinds to the snapshot manifest under
  *     the same OCC conditional put as every other commit
  *     (KvSnapshots.commitWith), with Iceberg-style conflict
  *     validation: concurrent pure data APPENDS rebase fine (the
  *     delta only addresses rows that existed at scan time);
  *     anything else that landed since the operation's scan —
  *     a concurrent DELETE's tombstones, a rewrite that removed
  *     files — aborts with CommitConflictException rather than
  *     committing a delta computed against vanished state;
  *   - scans apply tombstones in the reader with a sequential merge
  *     (KvPartitionReader), so every read path — including this
  *     operation's own rewrite scan — sees only live rows: an UPDATE
  *     can never resurrect a previously deleted row.
  *
  * Unlike the copy-on-write operation (KvRowLevelOperation), the scan
  * here keeps filter pushdown and runtime filtering ENABLED: a delta
  * commit only touches the rows it addresses, so skipping
  * non-matching rows is exactly right (the CoW hazard — row-skipping
  * survivors out of a whole-table replacement — does not exist).
  *
  * MoR requires snapshots: delete files are manifest members, and
  * time travel keeps reading pre-DML versions without them.
  */
class KvMorRowLevelOperation(
    path: String, cmd: RowLevelOperation.Command,
    buckets: Option[Int])
    extends RowLevelOperation with SupportsDelta {

  /** The snapshot version this operation's scan will read — captured
    * at operation creation, the base the commit-time conflict
    * validation compares against.
    */
  private val scanVersion: Int = KvSnapshots.latest(path).getOrElse(0)

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    // Membership pins to the scan version (conflict detection needs
    // a stable base), but the SCHEMA must be the table's CURRENT one:
    // Catalyst plans the whole rewrite against table.schema(), and
    // the re-insert rows are written current-shape.
    new KvScanBuilder(path, buckets, snapshots = true,
      pinnedVersion = Some(scanVersion).filter(_ > 0),
      colsOverride = Some(KvSchema.currentCols(path)))

  override def rowId(): Array[NamedReference] =
    Array(
      Expressions.column(KvJsonlSink.FileColumn),
      Expressions.column(KvJsonlSink.PosColumn))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty

  override def newWriteBuilder(
      info: LogicalWriteInfo): DeltaWriteBuilder = {
    // The delta write's ROW schema (inserts / the re-inserted half of
    // updates) is the table schema; row-id and metadata projections
    // arrive separately through the DeltaWriter calls. A pure DELETE
    // writes no data rows at all — its schema is EMPTY (struct<>),
    // discovered the hard way on the first end-to-end DELETE.
    val s = info.schema()
    val want = KvSchema.currentCols(path)
    require(
      s.isEmpty ||
        (s.length == want.length &&
          s.zip(want).forall { case (f, c) =>
          KvSchema.normalize(f.dataType) == c.dtype }),
      s"kvjsonl MoR delta write needs " +
        s"${KvSchema.toStruct(want).catalogString} or no data " +
        s"columns (DELETE); got ${s.catalogString}")
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new KvMorDeltaBatchWrite(
            path, info.queryId(), buckets, scanVersion)
      }
    }
  }

  override def description(): String =
    s"kvjsonl MoR $cmd on $path (scan v$scanVersion)"
}

/** One delta task's output: ordinary data files (inserts) plus at
  * most one positional delete file (tombstones). `deleteFile.rows` is
  * the tombstone count the manifest records — what makes the
  * manifest-only COUNT(*) still exact on a MoR table.
  */
case class KvDeltaCommitMessage(
    dataFiles: Seq[KvWrittenFile],
    deleteFile: Option[KvWrittenFile])
    extends WriterCommitMessage

class KvMorDeltaBatchWrite(
    path: String, jobId: String, buckets: Option[Int], scanVersion: Int)
    extends DeltaBatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory = {
    java.nio.file.Files.createDirectories(
      KvJsonlSink.tempDir(path, jobId))
    // Column registry captured driver-side, once per job — same
    // mid-job-ALTER isolation as the batch write factory.
    val meta = KvBucketing.readMetaFull(path)
    new KvMorDeltaWriterFactory(path, jobId, buckets,
      KvSchema.currentCols(path), meta.blooms, meta.partition)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Paths.get(path)
    val published = messages.toSeq.flatMap {
      case KvDeltaCommitMessage(data, del) => data ++ del
    }
    published.foreach { f =>
      java.nio.file.Files.move(
        java.nio.file.Paths.get(f.tempFile),
        dir.resolve(f.finalName),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val added = messages.toSeq.flatMap {
      case KvDeltaCommitMessage(data, del) =>
        data.map(f => KvSnapshots.KvFileStat(
          f.finalName, f.rows, f.minKey, f.maxKey,
          keysKnown = f.keyStatsKnown,
          colStats = f.colStats)) ++
          del.map(f => KvSnapshots.KvFileStat(
            f.finalName, f.rows, None, None, keysKnown = false))
    }
    KvSnapshots.commitWith(path) { base =>
      val cur =
        if (base == 0) Seq.empty[KvSnapshots.KvFileStat]
        else KvSnapshots.membersWithStats(path, base)
      if (base != scanVersion) {
        // Conflict validation (the Iceberg validateDataFilesExist /
        // validateNoConflictingDeletes shape): commits that landed
        // since this operation's scan are tolerable ONLY if they are
        // pure data appends — the delta addresses (file, pos) row ids
        // that still exist and are still live. A removed file or a
        // concurrent tombstone falsifies that; committing anyway
        // could delete the wrong rows or double-tombstone (which
        // would corrupt the manifest's exact live-row arithmetic).
        val atScan: Set[String] =
          if (scanVersion == 0) Set.empty
          else KvSnapshots.membersWithStats(path, scanVersion)
            .map(_.name).toSet
        val now = cur.map(_.name).toSet
        val removed = atScan -- now
        val newDeletes =
          (now -- atScan).filter(KvSnapshots.isDeleteFile)
        if (removed.nonEmpty || newDeletes.nonEmpty)
          throw new KvSnapshots.CommitConflictException(
            s"MoR $jobId on $path scanned v$scanVersion but v$base " +
              "holds conflicting changes since " +
              s"(removed: ${removed.mkString(",")}; concurrent " +
              s"deletes: ${newDeletes.mkString(",")}) — rerun the DML")
      }
      cur ++ added
    }
    KvJsonlSink.cleanupJobTemp(path, jobId)
    java.nio.file.Files.write(
      dir.resolve("_SUCCESS"), Array.emptyByteArray)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    KvJsonlSink.cleanupJobTemp(path, jobId)
}

class KvMorDeltaWriterFactory(
    path: String, jobId: String, buckets: Option[Int],
    cols: Seq[KvSchema.Col] = KvSchema.Legacy,
    bloomIds: Seq[Int] = Nil,
    partition: Option[(KvBucketing.PartUnit, Int)] = None)
    extends DeltaWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new KvMorDeltaWriter(path, jobId, partitionId, taskId, buckets, cols,
      bloomIds, partition)
}

/** Per-task delta writer: inserts delegate to the ordinary data
  * writers (plain or bucket-routing — a MoR commit is always an
  * APPEND, so the existing attempt-isolation naming applies
  * unchanged); deletes buffer (file, pos) tombstones and flush them
  * to one sorted `.del` temp file at task commit. Buffer size is
  * bounded by the task's matched-row count — tombstones are two
  * numbers and a name, the same order of memory the task's shuffle
  * buffers already hold.
  */
class KvMorDeltaWriter(
    path: String, jobId: String, partitionId: Int, taskId: Long,
    buckets: Option[Int],
    cols: Seq[KvSchema.Col] = KvSchema.Legacy,
    bloomIds: Seq[Int] = Nil,
    partition: Option[(KvBucketing.PartUnit, Int)] = None)
    extends DeltaWriter[InternalRow] {

  private var dataWriter: DataWriter[InternalRow] = _

  private def writer(): DataWriter[InternalRow] = {
    if (dataWriter == null)
      dataWriter = (buckets, partition) match {
        case (Some(n), Some((unit, id))) =>
          new KvJsonlComposedDataWriter(
            path, jobId, partitionId, taskId, n, unit, id, cols,
            bloomIds)
        case (Some(n), None) =>
          new KvJsonlBucketedDataWriter(
            path, jobId, partitionId, taskId, n, cols, bloomIds)
        case (None, Some((unit, id))) =>
          new KvJsonlPartitionedDataWriter(
            path, jobId, partitionId, taskId, unit, id, cols, bloomIds)
        case (None, None) =>
          new KvJsonlDataWriter(path,
            f"attempt-$jobId-$partitionId%05d-$taskId",
            f"part-$jobId-$partitionId%05d.jsonl",
            jobSubdir = jobId, cols = cols, bloomIds = bloomIds)
      }
    dataWriter
  }

  private val tombstones =
    scala.collection.mutable.ArrayBuffer.empty[(String, Long)]

  override def insert(row: InternalRow): Unit = writer().write(row)

  /** `id` is the rowId projection in declaration order:
    * (_file STRING, _pos BIGINT). The delete file records the file
    * NAME — manifests are location-independent.
    */
  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    val file = id.getUTF8String(0).toString
    val name = java.nio.file.Paths.get(file).getFileName.toString
    tombstones += ((name, id.getLong(1)))
  }

  /** Unreachable under representUpdateAsDeleteAndInsert = true; kept
    * semantically correct anyway — an update IS delete + insert.
    */
  override def update(
      meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(meta, id)
    insert(row)
  }

  override def commit(): WriterCommitMessage = {
    val data: Seq[KvWrittenFile] =
      if (dataWriter == null) Seq.empty
      else dataWriter.commit() match {
        case KvJsonlCommitMessage(f) => Seq(f)
        case KvJsonlBucketedCommitMessage(fs) => fs
      }
    val del: Option[KvWrittenFile] =
      if (tombstones.isEmpty) None
      else {
        val tmp = KvJsonlSink.tempDir(path, jobId).resolve(
          f"attempt-$jobId-$partitionId%05d-$taskId.del")
        java.nio.file.Files.write(tmp,
          tombstones.sorted
            .map { case (n, p) => s"$n\t$p" }
            .mkString("\n").getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
        Some(KvWrittenFile(
          tmp.toString,
          f"delete-$jobId-$partitionId%05d.del",
          tombstones.size.toLong, None, None))
      }
    KvDeltaCommitMessage(data, del)
  }

  override def abort(): Unit = {
    if (dataWriter != null) dataWriter.abort()
    tombstones.clear()
  }

  override def close(): Unit = if (dataWriter != null) dataWriter.close()
}
