package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation, Write, WriteBuilder}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** READ side of the kvjsonl connector (the write side and line format
  * live in KvJsonlSink.scala): one input partition per committed
  * `.jsonl` file — the same file-grain parallelism the parquet source
  * uses, minus intra-file splitting (line-oriented JSON has no row
  * groups; at deployment scale the sink's per-task files are already
  * the right split size because each was one write task's output).
  * Temp-dir attempt files are structurally invisible (they live under
  * `_temporary`, never matching the top-level listing), so a reader
  * concurrent with a write only ever sees published files — the
  * read-side half of the sink's exactly-once story.
  */
class KvScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  // Column pruning lands HERE, not in the reader: a 2-column table
  // still profits (count(*) scans parse no fields), and the `_file`
  // metadata column only materializes when the plan asks for it.
  private var required: StructType = KvJsonlSink.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // Key-predicate pushdown: comparisons against the long key are
  // evaluated in the reader on the PARSED key, before any value
  // unescape or UTF8String materialization — the row-level analogue
  // of parquet's row-group skip (this format has no per-file stats,
  // so file-level pruning isn't available; at deployment scale the
  // sink would write a min/max manifest to get it). Every filter is
  // ALSO returned to Spark for re-evaluation — the reader skip is a
  // pure optimization, never a correctness dependency, so a
  // predicate class the reader half-understands can't corrupt
  // results.
  private var pushed: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]):
      Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(KvKeyPredicate.supports)
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushed

  override def build(): Scan = new KvScan(path, required, pushed)
}

/** The reader-side compiled form of the pushed key predicates. */
object KvKeyPredicate {
  import org.apache.spark.sql.sources._

  def supports(f: Filter): Boolean = f match {
    case EqualTo("key", _: java.lang.Long) => true
    case GreaterThan("key", _: java.lang.Long) => true
    case GreaterThanOrEqual("key", _: java.lang.Long) => true
    case LessThan("key", _: java.lang.Long) => true
    case LessThanOrEqual("key", _: java.lang.Long) => true
    case IsNotNull("key") => true
    case _ => false
  }

  /** Conjunction of all supported filters over the parsed key (None
    * = null key): comparisons are null-rejecting like SQL.
    */
  def eval(filters: Array[Filter], key: Option[Long]): Boolean =
    filters.forall {
      case IsNotNull("key") => key.isDefined
      case EqualTo("key", v: java.lang.Long) => key.contains(v.longValue)
      case GreaterThan("key", v: java.lang.Long) =>
        key.exists(_ > v.longValue)
      case GreaterThanOrEqual("key", v: java.lang.Long) =>
        key.exists(_ >= v.longValue)
      case LessThan("key", v: java.lang.Long) =>
        key.exists(_ < v.longValue)
      case LessThanOrEqual("key", v: java.lang.Long) =>
        key.exists(_ <= v.longValue)
      case _ => true
    }

  /** Test observability: rows skipped by reader-side predicate
    * evaluation in this JVM (single-JVM specs read it; at deployment
    * this would be a custom task metric).
    */
  val skipped = new java.util.concurrent.atomic.AtomicLong
}

class KvScan(
    path: String, required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"kvjsonl $path PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isDirectory(dir)) Array.empty
    else {
      val s = java.nio.file.Files.list(dir)
      try s.iterator().asScala
        .map(_.toString)
        .filter(_.endsWith(".jsonl"))
        .toArray
        .sorted // deterministic partition order across runs
        .map(f => KvInputPartition(f): InputPartition)
      finally s.close()
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory(required.fieldNames, pushed)
}

case class KvInputPartition(file: String) extends InputPartition

class KvReaderFactory(
    fields: Array[String],
    pushed: Array[org.apache.spark.sql.sources.Filter])
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new KvPartitionReader(
      partition.asInstanceOf[KvInputPartition].file, fields, pushed)
}

class KvPartitionReader(
    file: String, fields: Array[String],
    pushed: Array[org.apache.spark.sql.sources.Filter])
    extends PartitionReader[InternalRow] {

  private val in = java.nio.file.Files.newBufferedReader(
    java.nio.file.Paths.get(file),
    java.nio.charset.StandardCharsets.UTF_8)
  private val fileUtf8 = UTF8String.fromString(file)
  private var row: InternalRow = _

  @annotation.tailrec
  final override def next(): Boolean = {
    val line = in.readLine()
    if (line == null) false
    else if (pushed.nonEmpty &&
        !KvKeyPredicate.eval(pushed, KvJsonlSink.parseKey(line))) {
      KvKeyPredicate.skipped.incrementAndGet()
      next()
    } else {
      val (k, v) = KvJsonlSink.parseLine(line)
      row = InternalRow.fromSeq(fields.toSeq.map {
        case "key" => k.map(Long.box).orNull
        case "value" => v.map(UTF8String.fromString).orNull
        case KvJsonlSink.FileColumn => fileUtf8
        case other => throw new IllegalArgumentException(
          s"kvjsonl scan cannot produce column $other")
      })
      true
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** The group-based row-level operation behind SQL DELETE / UPDATE /
  * MERGE on a kvjsonl table (KvJsonlTable.newRowLevelOperationBuilder
  * has the protocol overview). The scan is the ordinary kvjsonl scan;
  * the write is the ordinary two-phase-commit batch write in truncate
  * mode, because this table is a single replacement group. Catalyst
  * owns the rewrite query (surviving-rows filter, update projection,
  * or merge join) — the connector only supplies scan + replace-write.
  */
class KvRowLevelOperation(
    path: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(path)

  /** `_file` rides along so Catalyst plans the metadata-aware
    * replace-write (ProjectingInternalRow strips the rewrite's
    * bookkeeping columns before rows reach the writer — the same
    * task path Iceberg's copy-on-write uses). The commit here
    * replaces the whole table, so the writer discards the metadata
    * row; a file-group committer would collect it to replace only
    * touched files.
    */
  override def requiredMetadataAttributes():
      Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(KvJsonlSink.FileColumn))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    require(
      s.length == 2 &&
        s(0).dataType == LongType && s(1).dataType == StringType,
      s"kvjsonl row-level write needs (BIGINT, STRING); " +
        s"got ${s.catalogString}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
          new KvJsonlBatchWrite(
            path, truncateFirst = true, info.queryId())
      }
    }
  }
}

/** `KvCatalog` — a DataSourceV2 `TableCatalog` over a warehouse
  * directory of kvjsonl tables, registered per session with
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft_kv",
  *   "graft.sources.KvCatalog")
  * spark.conf.set("spark.sql.catalog.graft_kv.warehouse", dir)
  * }}}
  *
  * after which the FULL SQL DDL/DML surface resolves against it:
  * CREATE/DROP TABLE, INSERT INTO/OVERWRITE, SELECT, and — through
  * `SupportsRowLevelOperations` on the table — DELETE FROM, UPDATE
  * and MERGE INTO, the DML triad Spark's built-in file sources don't
  * support at all. Layout: `warehouse/<namespace>/<table>/` holding
  * the table's `.jsonl` files, one directory level per namespace
  * (single-level namespaces, like a database of tables).
  *
  * The catalog itself is metadata-only (directory listings and
  * renames); every data-bearing operation goes through the scan /
  * two-phase-commit write, so the catalog adds no scale constraint
  * beyond the connector's own.
  */
class KvCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: java.nio.file.Path = _

  /** Reserved virtual namespace holding the catalog's maintenance
    * procedures (`CALL graft_kv.system.compact(...)`) — always
    * "exists", holds no tables, cannot be created or dropped.
    */
  private val SystemNs = Array("system")

  override def initialize(
      name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = options.get("warehouse")
    require(wh != null && wh.nonEmpty,
      s"catalog $name requires spark.sql.catalog.$name.warehouse")
    warehouse = java.nio.file.Paths.get(wh)
    // `default` exists from birth, like the session catalog's.
    java.nio.file.Files.createDirectories(warehouse.resolve("default"))
  }

  override def name(): String = catalogName

  private def nsPath(ns: Array[String]): java.nio.file.Path = {
    if (ns.length != 1)
      throw new NoSuchNamespaceException(ns)
    warehouse.resolve(ns.head)
  }

  private def tablePath(ident: Identifier): java.nio.file.Path =
    nsPath(ident.namespace()).resolve(ident.name())

  // ---- tables ----

  override def listTables(ns: Array[String]): Array[Identifier] = {
    if (ns.sameElements(SystemNs)) return Array.empty
    val p = nsPath(ns)
    if (!java.nio.file.Files.isDirectory(p))
      throw new NoSuchNamespaceException(ns)
    val s = java.nio.file.Files.list(p)
    try s.iterator().asScala
      .filter(java.nio.file.Files.isDirectory(_))
      .map(d => Identifier.of(ns, d.getFileName.toString))
      .toArray
      .sortBy(_.name())
    finally s.close()
  }

  override def loadTable(ident: Identifier): Table = {
    val p = tablePath(ident)
    if (!java.nio.file.Files.isDirectory(p))
      throw new NoSuchTableException(ident)
    new KvJsonlTable(p.toString)
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "kvjsonl tables are unpartitioned (the sink's commit protocol " +
        "publishes whole files, not partition dirs)")
    val want = KvJsonlSink.Schema
    require(
      schema.length == 2 &&
        schema(0).name == want(0).name &&
        schema(0).dataType == LongType &&
        schema(1).name == want(1).name &&
        schema(1).dataType == StringType,
      s"kvjsonl tables have the fixed schema ${want.catalogString}; " +
        s"got ${schema.catalogString}")
    val p = tablePath(ident)
    if (java.nio.file.Files.isDirectory(p))
      throw new TableAlreadyExistsException(ident)
    java.nio.file.Files.createDirectories(p)
    new KvJsonlTable(p.toString)
  }

  override def alterTable(
      ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "kvjsonl tables have a fixed schema; ALTER TABLE is not supported")

  override def dropTable(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    if (!java.nio.file.Files.isDirectory(p)) false
    else { graft.Fs.deleteRecursively(p.toString); true }
  }

  override def renameTable(
      oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tablePath(oldIdent)
    if (!java.nio.file.Files.isDirectory(from))
      throw new NoSuchTableException(oldIdent)
    val to = tablePath(newIdent)
    if (java.nio.file.Files.isDirectory(to))
      throw new TableAlreadyExistsException(newIdent)
    java.nio.file.Files.move(from, to)
  }

  // ---- namespaces ----

  override def listNamespaces(): Array[Array[String]] = {
    val s = java.nio.file.Files.list(warehouse)
    try s.iterator().asScala
      .filter(java.nio.file.Files.isDirectory(_))
      .map(d => Array(d.getFileName.toString))
      .toArray
      .sortBy(_.head)
    finally s.close()
  }

  override def listNamespaces(
      ns: Array[String]): Array[Array[String]] =
    if (ns.isEmpty) listNamespaces()
    else if (namespaceExists(ns)) Array.empty
    else throw new NoSuchNamespaceException(ns)

  override def namespaceExists(ns: Array[String]): Boolean =
    ns.sameElements(SystemNs) ||
      (ns.length == 1 &&
        java.nio.file.Files.isDirectory(warehouse.resolve(ns.head)))

  override def loadNamespaceMetadata(
      ns: Array[String]): util.Map[String, String] =
    if (namespaceExists(ns)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(ns)

  override def createNamespace(
      ns: Array[String],
      metadata: util.Map[String, String]): Unit = {
    if (ns.length != 1)
      throw new IllegalArgumentException(
        s"kv catalog namespaces are single-level: ${ns.mkString(".")}")
    if (namespaceExists(ns))
      throw new NamespaceAlreadyExistsException(ns)
    java.nio.file.Files.createDirectories(warehouse.resolve(ns.head))
  }

  override def alterNamespace(
      ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "kv catalog namespaces carry no metadata to alter")

  // ---- procedures (CALL graft_kv.system.<proc>(...)) ----

  override def listProcedures(ns: Array[String]): Array[Identifier] =
    if (ns.sameElements(SystemNs))
      Array(Identifier.of(SystemNs, "compact"))
    else Array.empty

  override def loadProcedure(ident: Identifier): procedures.UnboundProcedure = {
    if (!ident.namespace().sameElements(SystemNs) ||
        ident.name() != "compact")
      throw new IllegalArgumentException(
        s"no such procedure: ${ident.namespace().mkString(".")}." +
          s"${ident.name()} (the kv catalog ships " +
          "system.compact(table, target_files))")
    new KvCompactProcedure(this)
  }

  /** Resolve `"namespace.table"` (or bare `"table"` → default) to its
    * directory, for procedures that take the table as a string arg.
    */
  private[sources] def resolveTableDir(
      table: String): java.nio.file.Path = {
    val parts = table.split('.')
    val ident = parts match {
      case Array(t) => Identifier.of(Array("default"), t)
      case Array(ns, t) => Identifier.of(Array(ns), t)
      case _ => throw new IllegalArgumentException(
        s"table must be 'table' or 'namespace.table': $table")
    }
    val p = tablePath(ident)
    if (!java.nio.file.Files.isDirectory(p))
      throw new NoSuchTableException(ident)
    p
  }

  override def dropNamespace(
      ns: Array[String], cascade: Boolean): Boolean = {
    if (ns.sameElements(SystemNs))
      throw new IllegalArgumentException(
        "the system namespace is reserved for procedures")
    if (!namespaceExists(ns)) return false
    if (!cascade && listTables(ns).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${ns.head} is not empty")
    graft.Fs.deleteRecursively(warehouse.resolve(ns.head).toString)
    true
  }
}

/** `system.compact` — the small-files MAINTENANCE procedure
  * (Iceberg's `rewrite_data_files` shape):
  *
  * {{{ CALL graft_kv.system.compact(table => 'default.t',
  *                                  target_files => 2) }}}
  *
  * A long-appended table accumulates one file per write task per
  * job; at 100 TB the resulting file-count — not byte-count — is
  * what kills scan planning (one input partition per file here, one
  * footer/open per file everywhere). The rewrite is a DISTRIBUTED
  * job: the table read through its own scan, repartitioned to the
  * target file count, written back through the connector's
  * two-phase-commit overwrite — tasks read the old files while the
  * replacement stays invisible in `_temporary`, and the
  * truncate+publish happens atomically at driver commit, so a
  * concurrent reader sees old or new, never a mix. Returns one row
  * (files_before, files_after, n_rows) via a LocalScan.
  *
  * The batch `compact_small_files` gate pins the same maintenance
  * shape for parquet paths; this is its catalog-DML twin, invocable
  * from pure SQL.
  */
class KvCompactProcedure(cat: KvCatalog)
    extends procedures.UnboundProcedure {

  override def name(): String = "compact"
  override def description(): String =
    "rewrite a kv table's jsonl files into target_files files"

  override def bind(
      inputType: StructType): procedures.BoundProcedure =
    new procedures.BoundProcedure {
      override def name(): String = "compact"
      override def description(): String = KvCompactProcedure.this.description()
      override def isDeterministic: Boolean = false

      override def parameters(): Array[procedures.ProcedureParameter] =
        Array(
          procedures.ProcedureParameter
            .in("table", StringType)
            .comment("'namespace.table' (or bare table => default ns)")
            .build(),
          procedures.ProcedureParameter
            .in("target_files", org.apache.spark.sql.types.IntegerType)
            .defaultValue("1")
            .comment("file count after the rewrite")
            .build())

      override def call(
          input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
        val table = input.getUTF8String(0).toString
        val target =
          if (input.numFields > 1 && !input.isNullAt(1)) input.getInt(1)
          else 1
        require(target >= 1, s"target_files must be >= 1, got $target")
        val dir = cat.resolveTableDir(table)

        def jsonlCount: Long = {
          val s = java.nio.file.Files.list(dir)
          try s.iterator().asScala
            .count(_.getFileName.toString.endsWith(".jsonl"))
          finally s.close()
        }

        val spark = org.apache.spark.sql.SparkSession.active
        val before = jsonlCount
        val rows = spark.read
          .format("graft.sources.KvJsonlSink")
          .load(dir.toString)
          .repartition(target)
          .write
          .format("graft.sources.KvJsonlSink")
          .mode("overwrite")
          .save(dir.toString)
        val after = jsonlCount
        val nRows = spark.read
          .format("graft.sources.KvJsonlSink")
          .load(dir.toString)
          .count()
        val out: org.apache.spark.sql.connector.read.Scan =
          new org.apache.spark.sql.connector.read.LocalScan {
            override def readSchema(): StructType =
              KvCompactProcedure.OutSchema
            override def rows(): Array[InternalRow] =
              Array(InternalRow(before, after, nRows))
          }
        util.Collections.singletonList(out).iterator()
      }
    }
}

object KvCompactProcedure {
  val OutSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("files_before", LongType),
    org.apache.spark.sql.types.StructField("files_after", LongType),
    org.apache.spark.sql.types.StructField("n_rows", LongType)))
}
