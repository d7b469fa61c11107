package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `<table>$snapshots` — the commit-history metadata table of a
  * snapshotted kv table (Iceberg's `.snapshots` / Delta's DESCRIBE
  * HISTORY shape): one row per RETAINED manifest version, computed
  * entirely from manifest metadata — no data file is ever opened, so
  * the query costs the same at 100 TB as at 100 KB.
  *
  * {{{ SELECT * FROM graft_kv.default.`t$snapshots` }}}
  *
  * Columns:
  *   - `version`          — the manifest version (the time-travel pin)
  *   - `committed_at_ms`  — manifest commit wall time (epoch millis)
  *   - `n_data_files` / `n_delete_files` — membership composition
  *   - `live_rows`        — data rows − tombstones (NULL when any
  *     member predates stats — a migrated file with unknown counts)
  *   - `added_files` / `removed_files` — membership diff vs the
  *     predecessor (NULL for the oldest retained version when its
  *     predecessor has been expired — the diff is unknowable, same
  *     honesty rule as everywhere else in the connector)
  */
object KvSnapshotsMetaTable {
  val Schema: StructType = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("committed_at_ms", LongType, nullable = false),
    StructField("n_data_files", LongType, nullable = false),
    StructField("n_delete_files", LongType, nullable = false),
    StructField("live_rows", LongType, nullable = true),
    StructField("added_files", LongType, nullable = true),
    StructField("removed_files", LongType, nullable = true)))

  /** One row per retained version, oldest first. Driver-side and
    * metadata-only by construction: the row count is the number of
    * retained snapshots, bounded by the expiration policy.
    */
  def rows(path: String): Seq[Seq[Any]] = {
    val vs = KvSnapshots.versions(path)
    vs.map { v =>
      val stats = KvSnapshots.membersWithStats(path, v)
      val data = KvSnapshots.dataFiles(stats)
      val dels = KvSnapshots.deleteFiles(stats)
      val live: Any =
        if (stats.exists(_.rows < 0)) null
        else Long.box(data.map(_.rows).sum - dels.map(_.rows).sum)
      val prev: Option[Set[String]] =
        if (v == vs.head && v > 1) None // predecessor expired
        else if (v == 1) Some(Set.empty)
        else KvSnapshots.membersIfPresent(path, v - 1).map(_.toSet)
      val names = stats.map(_.name).toSet
      val added: Any =
        prev.map(p => Long.box((names -- p).size.toLong)).orNull
      val removed: Any =
        prev.map(p => Long.box((p -- names).size.toLong)).orNull
      Seq(
        Int.box(v),
        Long.box(KvSnapshots.commitMillis(path, v)),
        Long.box(data.size.toLong),
        Long.box(dels.size.toLong),
        live, added, removed)
    }
  }
}

class KvSnapshotsMetaTable(path: String, tableName: String)
    extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = KvSnapshotsMetaTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    () => new KvSnapshotsMetaScan(path)
}

/** Single-partition local scan: the rows are computed at PLANNING
  * time on the driver (they are manifest metadata — a handful per
  * retained version) and ship to the one task whole.
  */
class KvSnapshotsMetaScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = KvSnapshotsMetaTable.Schema
  override def toBatch: Batch = this
  override def description(): String = s"kvjsonl snapshots($path)"

  override def planInputPartitions(): Array[InputPartition] =
    Array(KvLocalRowsPartition(KvSnapshotsMetaTable.rows(path)))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          partition: InputPartition): PartitionReader[InternalRow] = {
        val rows = partition
          .asInstanceOf[KvLocalRowsPartition].rows.iterator
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean =
            if (!rows.hasNext) false
            else { cur = InternalRow.fromSeq(rows.next()); true }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}

case class KvLocalRowsPartition(rows: Seq[Seq[Any]])
    extends InputPartition

/** `<table>$refs` — the named-ref metadata table (Iceberg's `.refs`
  * shape): one row per TAG (KvRefs.scala) and per BRANCH
  * (KvBranches.scala), metadata-only like `$snapshots`.
  *
  * {{{ SELECT * FROM graft_kv.default.`t$refs` }}}
  *
  * Columns:
  *   - `name` / `kind`  — the ref and whether it is a tag or branch
  *   - `version`        — what a `VERSION AS OF name` read resolves
  *     to: the pinned version (tag) or the current head (branch)
  *   - `base_version`   — the main version a branch was created at
  *     (what fast_forward checks against); NULL for tags
  */
object KvRefsMetaTable {
  val Schema: StructType = StructType(Seq(
    StructField("name", org.apache.spark.sql.types.StringType,
      nullable = false),
    StructField("kind", org.apache.spark.sql.types.StringType,
      nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("base_version", LongType, nullable = true)))

  def rows(path: String): Seq[Seq[Any]] = {
    import org.apache.spark.unsafe.types.UTF8String
    val tags = KvRefs.read(path).toSeq.sortBy(_._1).map {
      case (n, v) =>
        Seq(UTF8String.fromString(n), UTF8String.fromString("tag"),
          Long.box(v.toLong), null)
    }
    val branches = KvBranches.list(path).map { b =>
      Seq(UTF8String.fromString(b), UTF8String.fromString("branch"),
        Long.box(KvBranches.head(path, b).toLong),
        Long.box(KvBranches.base(path, b).toLong))
    }
    tags ++ branches
  }
}

class KvRefsMetaTable(path: String, tableName: String)
    extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = KvRefsMetaTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    () => new KvRefsMetaScan(path)
}

class KvRefsMetaScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = KvRefsMetaTable.Schema
  override def toBatch: Batch = this
  override def description(): String = s"kvjsonl refs($path)"

  override def planInputPartitions(): Array[InputPartition] =
    Array(KvLocalRowsPartition(KvRefsMetaTable.rows(path)))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          partition: InputPartition): PartitionReader[InternalRow] = {
        val rows = partition
          .asInstanceOf[KvLocalRowsPartition].rows.iterator
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean =
            if (!rows.hasNext) false
            else { cur = InternalRow.fromSeq(rows.next()); true }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}

/** `<table>$files` — the per-FILE metadata table (Iceberg's `.files`
  * shape): one row per member of the CURRENT snapshot, straight from
  * the manifest — name, kind, row/tombstone count, the key zone map,
  * the layout token the file name carries (bucket or partition unit),
  * and the per-column stats. Metadata-only like `$snapshots`: this is
  * the ops surface for "why didn't my query prune" at 100 TB, where
  * opening files to answer that would itself be the problem.
  *
  * {{{ SELECT * FROM graft_kv.default.`t$files` }}}
  */
object KvFilesMetaTable {
  import org.apache.spark.sql.types.StringType

  val Schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("rows", LongType, nullable = true),
    StructField("min_key", LongType, nullable = true),
    StructField("max_key", LongType, nullable = true),
    StructField("layout", StringType, nullable = true),
    StructField("n_col_stats", IntegerType, nullable = false),
    StructField("col_stats", StringType, nullable = true)))

  def rows(
      path: String, pinned: Option[Int] = None,
      branch: Option[String] = None): Seq[Seq[Any]] =
    pinned.orElse(KvSnapshots.latest(path)).toSeq.flatMap { v =>
      KvSnapshots.membersWithStats(path, v, branch).map { st =>
        val isDel = KvSnapshots.isDeleteFile(st.name)
        // the self-describing layout token, exactly as the file name
        // carries it: `b0003` (bucket) or `d9862`/`m334`/... (unit)
        val layout: Any = {
          val b = KvBucketing.fileBucket(st.name)
            .map(b => f"b$b%04d")
          val p = Seq(KvBucketing.PartHours, KvBucketing.PartDays,
            KvBucketing.PartMonths, KvBucketing.PartYears).flatMap(u =>
            KvBucketing.filePart(st.name, u).map(t =>
              s"${u.tag}${t.fold("null")(_.toString)}"))
            .headOption
          // composed files report their full `m334-b0007` cell
          val tok = (p, b) match {
            case (Some(pu), Some(bu)) => Some(s"$pu-$bu")
            case _ => b.orElse(p)
          }
          tok.map(org.apache.spark.unsafe.types.UTF8String
            .fromString).orNull
        }
        Seq(
          org.apache.spark.unsafe.types.UTF8String.fromString(st.name),
          org.apache.spark.unsafe.types.UTF8String.fromString(
            if (isDel) "delete" else "data"),
          if (st.rows < 0) null else Long.box(st.rows),
          st.minKey.map(Long.box).orNull,
          st.maxKey.map(Long.box).orNull,
          layout,
          Int.box(st.colStats.size),
          if (st.colStats.isEmpty) null
          else org.apache.spark.unsafe.types.UTF8String.fromString(
            KvSnapshots.encodeColStats(st.colStats)))
      }
    }
}

class KvFilesMetaTable(
    path: String, tableName: String, pinned: Option[Int] = None,
    branch: Option[String] = None)
    extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = KvFilesMetaTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    () => new KvFilesMetaScan(path, pinned, branch)
}

class KvFilesMetaScan(
    path: String, pinned: Option[Int] = None,
    branch: Option[String] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = KvFilesMetaTable.Schema
  override def toBatch: Batch = this
  override def description(): String = s"kvjsonl files($path)"

  override def planInputPartitions(): Array[InputPartition] =
    Array(KvLocalRowsPartition(
      KvFilesMetaTable.rows(path, pinned, branch)))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          partition: InputPartition): PartitionReader[InternalRow] = {
        val rows = partition
          .asInstanceOf[KvLocalRowsPartition].rows.iterator
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean =
            if (!rows.hasNext) false
            else { cur = InternalRow.fromSeq(rows.next()); true }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}

/** `<table>$partitions` — the per-PARTITION metadata table (Iceberg's
  * `.partitions` shape): one row per layout token of the CURRENT
  * snapshot — bucket (`b0003`) or temporal partition unit (`d9862`,
  * `m334`, ...) — aggregating membership straight from the manifest.
  * Metadata-only like `$files`: the capacity-planning surface ("which
  * day is hot", "which bucket skewed") at 100 TB, where a data scan
  * to answer it would be the problem.
  *
  * {{{ SELECT * FROM graft_kv.default.`t$partitions` }}}
  *
  * Columns:
  *   - `partition`      — the layout token exactly as file names
  *     carry it; NULL for files without one (an unlayouted table,
  *     leftovers from before a partition-evolution ALTER — and every
  *     positional delete file: `.del` members are PARTITION-AGNOSTIC
  *     in this format (one job-named file may tombstone rows of many
  *     partitions), so they aggregate under the NULL row rather than
  *     claim a partition they can't prove)
  *   - `n_data_files` / `n_delete_files` — membership composition
  *   - `data_rows` / `tombstones` — data-row and tombstone counts
  *     (NULL data_rows when any member predates stats)
  *   - `min_key` / `max_key` — the partition-level key zone map
  *     (union of its files' ranges; NULL when unknown or keyless)
  */
object KvPartitionsMetaTable {
  import org.apache.spark.sql.types.StringType
  import org.apache.spark.unsafe.types.UTF8String

  val Schema: StructType = StructType(Seq(
    StructField("partition", StringType, nullable = true),
    StructField("n_data_files", LongType, nullable = false),
    StructField("n_delete_files", LongType, nullable = false),
    StructField("data_rows", LongType, nullable = true),
    StructField("tombstones", LongType, nullable = false),
    StructField("min_key", LongType, nullable = true),
    StructField("max_key", LongType, nullable = true)))

  /** A member's layout token — the same derivation `$files` shows per
    * file, here the GROUP key. Delete files never carry one (see the
    * class doc), so they group under None by construction.
    */
  private def layoutToken(name: String): Option[String] = {
    val b = KvBucketing.fileBucket(name).map(b => f"b$b%04d")
    val p = Seq(KvBucketing.PartHours, KvBucketing.PartDays,
      KvBucketing.PartMonths, KvBucketing.PartYears).flatMap(u =>
      KvBucketing.filePart(name, u).map(t =>
        s"${u.tag}${t.fold("null")(_.toString)}"))
      .headOption
    // a COMPOSED file (unit × bucket) groups by its full cell —
    // `m334-b0007` — so the partition report keeps one row per
    // physical layout group under every layout shape
    (p, b) match {
      case (Some(pu), Some(bu)) => Some(s"$pu-$bu")
      case _ => b.orElse(p)
    }
  }

  def rows(
      path: String, pinned: Option[Int] = None,
      branch: Option[String] = None): Seq[Seq[Any]] =
    pinned.orElse(KvSnapshots.latest(path)).toSeq.flatMap { v =>
      val stats = KvSnapshots.membersWithStats(path, v, branch)
      stats.groupBy(st => layoutToken(st.name))
        .toSeq.sortBy(_._1)
        .map { case (tok, members) =>
          val data = KvSnapshots.dataFiles(members)
          val dels = KvSnapshots.deleteFiles(members)
          val rowsKnown = data.forall(_.rows >= 0)
          val dataRows: Any =
            if (rowsKnown) Long.box(data.map(_.rows).sum) else null
          Seq(
            tok.map(UTF8String.fromString).orNull,
            Long.box(data.size.toLong),
            Long.box(dels.size.toLong),
            dataRows,
            Long.box(dels.map(_.rows).sum),
            data.flatMap(_.minKey).minOption.map(Long.box).orNull,
            data.flatMap(_.maxKey).maxOption.map(Long.box).orNull)
        }
    }
}

class KvPartitionsMetaTable(
    path: String, tableName: String, pinned: Option[Int] = None,
    branch: Option[String] = None)
    extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = KvPartitionsMetaTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    () => new KvPartitionsMetaScan(path, pinned, branch)
}

class KvPartitionsMetaScan(
    path: String, pinned: Option[Int] = None,
    branch: Option[String] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = KvPartitionsMetaTable.Schema
  override def toBatch: Batch = this
  override def description(): String = s"kvjsonl partitions($path)"

  override def planInputPartitions(): Array[InputPartition] =
    Array(KvLocalRowsPartition(
      KvPartitionsMetaTable.rows(path, pinned, branch)))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          partition: InputPartition): PartitionReader[InternalRow] = {
        val rows = partition
          .asInstanceOf[KvLocalRowsPartition].rows.iterator
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean =
            if (!rows.hasNext) false
            else { cur = InternalRow.fromSeq(rows.next()); true }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}
