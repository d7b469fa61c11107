package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `kvjsonl` DataSourceV2 WRITE path — the sink-side twin of the
  * `webpage` read connector, implementing the V2 two-phase commit
  * protocol that makes distributed writes EXACTLY-ONCE under task
  * retries and speculation:
  *
  *   1. every task attempt writes to a private temp file keyed by
  *      (partitionId, taskId) — concurrent attempts never collide;
  *   2. a task's `commit()` returns the temp path as its
  *      WriterCommitMessage; `abort()` deletes it;
  *   3. the DRIVER's `BatchWrite.commit` publishes exactly the files
  *      named in the commit messages (rename into the target dir +
  *      `_SUCCESS` manifest) — uncommitted/duplicate attempts are
  *      never visible to readers;
  *   4. `BatchWrite.abort` removes all temp output.
  *
  * Rows are (key BIGINT, value STRING) → one JSON line each, readable
  * back with `spark.read.schema(...).json(dir)` — the
  * `v2_sink_roundtrip` query pins the round trip through the oracle
  * gate, and `V2SinkSpec` drives the protocol edges directly
  * (duplicate attempt publication, temp-file invisibility).
  *
  * Local-filesystem rename stands in for the deployment FS committer;
  * the protocol shape (attempt isolation + driver-side publish) is
  * exactly what a cloud committer implements with multipart uploads.
  */
class KvJsonlSink extends TableProvider {
  // Format-path reads of a SCHEMA-EVOLVED table dir (written through
  // the catalog) must surface the evolved columns, not the founding
  // pair — the registry travels with the directory.
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    if (path == null || path.isEmpty) KvJsonlSink.Schema
    else KvSchema.toStruct(KvSchema.currentCols(path))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "kvjsonl sink requires a path (\".save(dir)\" or option(\"path\"))")
    new KvJsonlTable(path)
  }
}

object KvJsonlSink {
  val Schema: StructType = StructType(Seq(
    StructField("key", LongType),
    StructField("value", StringType)))

  /** Hidden `_file` metadata column (the provenance column every
    * file-based source exposes); also the row-level operations'
    * required metadata attribute — see KvRowLevelOperation.
    */
  val FileColumn = "_file"

  /** Hidden `_pos` metadata column: the row's 0-based physical line
    * ordinal within its file. (`_file`, `_pos`) is the stable row
    * address the merge-on-read path uses as its ROW ID — positional
    * delete files tombstone exactly these addresses (see
    * KvMerge.scala), the Iceberg position-delete shape.
    */
  val PosColumn = "_pos"

  def tempDir(path: String): java.nio.file.Path =
    java.nio.file.Paths.get(path, "_temporary")

  /** Per-JOB attempt scratch: `_temporary/<jobId>/`. Batch jobs are
    * scoped to their own subdir so one job's commit-time cleanup can
    * never delete a CONCURRENT job's in-flight attempt files — found
    * by KvOccSpec's racing-INSERT test (NoSuchFileException in the
    * loser's writer when the winner's commit swept the shared dir).
    * The streaming writer keeps the base dir: one query owns a sink,
    * and its per-epoch names are reaped by prefix, not recursively.
    */
  def tempDir(path: String, jobId: String): java.nio.file.Path =
    java.nio.file.Paths.get(path, "_temporary", jobId)

  /** Job-scoped temp cleanup: drop this job's subdir, then the base
    * `_temporary` IF now empty — a concurrent job's live subdir keeps
    * it (DirectoryNotEmptyException, swallowed by design); a lone job
    * leaves the table dir as clean as the pre-subdir layout did.
    */
  def cleanupJobTemp(path: String, jobId: String): Unit = {
    graft.Fs.deleteRecursively(tempDir(path, jobId))
    try { java.nio.file.Files.deleteIfExists(tempDir(path)); () }
    catch { case _: java.nio.file.DirectoryNotEmptyException => () }
  }

  /** One row → one sink line; shared by the plain and bucketed
    * writers so [[parseLine]] stays the single inverse.
    */
  def formatLine(row: InternalRow): String = {
    val value =
      if (row.isNullAt(1)) "null"
      else "\"" + escape(row.getUTF8String(1).toString) + "\""
    val key = if (row.isNullAt(0)) "null" else row.getLong(0).toString
    s"""{"key":$key,"value":$value}"""
  }

  /** Decode a quoted-escaped string token: `start` points AT the
    * opening quote; returns (decoded, index just past the closing
    * quote). The exact inverse of [[escape]] — one escape dialect
    * format-wide. Bounds-checked so a truncated line fails with the
    * contractual IllegalArgumentException, never an index error.
    */
  def unquoteAt(line: String, start: Int): (String, Int) = {
    require(start < line.length && line.charAt(start) == '"',
      s"bad kvjsonl line: $line")
    var i = start + 1
    val b = new StringBuilder
    while (i < line.length && line.charAt(i) != '"') {
      val c = line.charAt(i)
      if (c == '\\') {
        require(i + 1 < line.length, s"bad kvjsonl line: $line")
        line.charAt(i + 1) match {
          case '"' => b.append('"'); i += 2
          case '\\' => b.append('\\'); i += 2
          case 'n' => b.append('\n'); i += 2
          case 'r' => b.append('\r'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'u' =>
            require(i + 6 <= line.length, s"bad kvjsonl line: $line")
            b.append(Integer.parseInt(
              line.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => throw new IllegalArgumentException(
            s"bad escape \\$other in kvjsonl line: $line")
        }
      } else { b.append(c); i += 1 }
    }
    require(i < line.length, s"bad kvjsonl line: $line")
    (b.toString, i + 1)
  }

  /** Parse the key token of a sink line: (key, index of the char
    * right after the token — always the `,` before the value field).
    * The token is SELF-DESCRIBING: `null` → None, a leading quote →
    * a STRING key (string-keyed tables — KvSchema.keyType), anything
    * else → the founding bare long. One parse for both key types, so
    * every reader path (scan, CDC, change feed) handles string-keyed
    * tables with no type flag threaded through.
    */
  def parseKeyTok(line: String): (Option[Any], Int) = {
    require(line.startsWith("{\"key\":"), s"bad kvjsonl line: $line")
    if (7 < line.length && line.charAt(7) == '"') {
      val (s, after) = unquoteAt(line, 7)
      (Some(s), after)
    } else {
      var i = 7
      while (i < line.length && line.charAt(i) != ',') i += 1
      val keyTok = line.substring(7, i)
      (if (keyTok == "null") None else Some(keyTok.toLong), i)
    }
  }

  /** Key-only parse of a sink line — the cheap prefix read the
    * pushed-filter path uses to reject rows before [[parseLine]]
    * pays for the value unescape. Long or String per the table's key
    * type ([[parseKeyTok]]).
    */
  def parseKey(line: String): Option[Any] = parseKeyTok(line)._1

  /** Exact inverse of the writer's line format (see
    * [[KvJsonlDataWriter.write]]): `{"key":K,"value":V}` with K a
    * long, a quoted [[escape]]d string (string-keyed tables) or
    * `null`, and V `null` or a double-quoted [[escape]]d
    * string. Strict by design — these files are only ever written by
    * this sink, so a malformed line is corruption, not dialect. A
    * SCHEMA-EVOLVED line (KvSchema.formatRow) keeps this exact prefix
    * and appends `,"c<id>":...` fields after the value token; this
    * parser stops at the value token either way, so every founding
    * (key, value) projection — the $changes table, the change feed,
    * the fast scan path — reads evolved files unchanged.
    */
  def parseLine(line: String): (Option[Any], Option[String]) = {
    val (key, keyEnd) = parseKeyTok(line)
    var i = keyEnd
    require(line.startsWith(",\"value\":", i),
      s"bad kvjsonl line: $line")
    i += 9
    if (line.startsWith("null", i)) {
      // Terminator check: after the `null` token a well-formed line
      // continues with `}` (founding 2-column format) or `,` (evolved
      // extra fields). Without it a TRUNCATED line `{"key":1,"value":null`
      // would parse cleanly, weakening the "malformed line is
      // corruption" contract this strict parser exists to enforce.
      require(i + 4 < line.length &&
        (line.charAt(i + 4) == '}' || line.charAt(i + 4) == ','),
        s"bad kvjsonl line: $line")
      (key, None)
    }
    else {
      // bounds-checked quoted parse ([[unquoteAt]]) — a line cut at
      // ANY byte inside the value token fails with the contractual
      // IllegalArgumentException, never an index error
      val (v, after) = unquoteAt(line, i)
      // terminator check, same rationale as the null branch: without
      // it a line truncated right before its closing `}` parses
      // cleanly and the corruption contract silently weakens
      require(after < line.length &&
        (line.charAt(after) == '}' || line.charAt(after) == ','),
        s"bad kvjsonl line: $line")
      (key, Some(v))
    }
  }

  /** Minimal JSON string escaping for the value column (the key is a
    * long). Mirrors what a JSON reader must invert; kept tiny because
    * the sink's point is the COMMIT PROTOCOL, not a serializer.
    */
  def escape(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }
}

object KvJsonlTable {
  /** The V2 transform for a partition unit — the one mapping from
    * [[KvBucketing.PartUnit]] to Spark's transform vocabulary.
    */
  def partTransform(
      unit: KvBucketing.PartUnit, colName: String): Transform = {
    import org.apache.spark.sql.connector.expressions.{Expressions => E}
    unit match {
      case KvBucketing.PartDays => E.days(colName)
      case KvBucketing.PartMonths => E.months(colName)
      case KvBucketing.PartYears => E.years(colName)
      case KvBucketing.PartHours => E.hours(colName)
    }
  }
}

class KvJsonlTable(
    path: String,
    viaCatalog: Boolean = false,
    pinnedVersion: Option[Int] = None,
    branch: Option[String] = None)
    extends Table
    with SupportsRead with SupportsWrite with SupportsRowLevelOperations
    with SupportsMetadataColumns {
  override def name(): String =
    s"kvjsonl($path${pinnedVersion.fold("")(v => s"@v$v")}" +
      s"${branch.fold("")(b => s"@branch=$b")})"

  /** The table's columns — the founding (key, value) pair unless a
    * `_schema.json` registry records evolution (KvSchema.scala). A
    * PINNED table reports the schema in effect AT that snapshot, so
    * time travel across an ALTER reads old versions with their own
    * shape.
    */
  private lazy val cols: Seq[KvSchema.Col] =
    KvSchema.colsAsOf(path, pinnedVersion)
  override def schema(): StructType = KvSchema.toStruct(cols)

  /** CURRENT display name of the key column (field id 1) — the name
    * every Catalyst-facing transform/ordering reference must carry
    * (the key is a role, not a literal name; KvSchema.keyName).
    */
  private lazy val keyName: String = KvSchema.keyName(cols)

  /** Table meta (see KvBucketing.scala): bucket partitioning ⇒ the
    * scan reports KeyGroupedPartitioning (storage-partitioned joins)
    * and every batch write routes rows to per-bucket files; snapshots
    * ⇒ membership comes from manifests and commits retain history
    * (time travel — see KvSnapshots.scala).
    */
  private lazy val meta: KvBucketing.KvMeta =
    KvBucketing.readMetaFull(path)
  private def buckets: Option[Int] = meta.buckets

  override def partitioning(): Array[Transform] =
    buckets.toArray.map(n =>
      org.apache.spark.sql.connector.expressions.Expressions
        .bucket(n, keyName)) ++
      meta.partition.toArray.flatMap { case (u, id) =>
        cols.find(_.id == id).map(c =>
          KvJsonlTable.partTransform(u, c.name))
      }

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    if (meta.snapshots) m.put("snapshots", "true")
    if (meta.mor) m.put("dml", "mor")
    if (meta.sorted) m.put("write.sort", keyName)
    if (meta.blooms.nonEmpty)
      m.put("bloom_cols", meta.blooms.flatMap(id =>
        cols.find(_.id == id).map(_.name)).mkString(","))
    // Bucket-generation observability (system.rebucket): an operator
    // reading DESCRIBE EXTENDED can see both that an evolution is IN
    // FLIGHT (claims suppressed) and where the current generation
    // starts (pins below it read unclaimed).
    meta.rebucketTarget.foreach(n =>
      m.put("rebucket.in_progress_to", n.toString))
    meta.bucketsFrom.foreach(v =>
      m.put("buckets.from_version", v.toString))
    meta.autoCompact.foreach(t =>
      m.put("write.auto_compact", t.toString))
    meta.autoExpire.foreach(n =>
      m.put("expire.keep_last", n.toString))
    m
  }

  override def metadataColumns(): Array[MetadataColumn] =
    Array(
      new MetadataColumn {
        override def name(): String = KvJsonlSink.FileColumn
        override def dataType(): org.apache.spark.sql.types.DataType =
          StringType
        override def isNullable: Boolean = false
        override def comment(): String =
          "jsonl file this row was read from"
      },
      new MetadataColumn {
        override def name(): String = KvJsonlSink.PosColumn
        override def dataType(): org.apache.spark.sql.types.DataType =
          LongType
        override def isNullable: Boolean = false
        override def comment(): String =
          "0-based physical line ordinal within _file (the MoR row id)"
      })
  override def capabilities(): util.Set[TableCapability] = {
    val caps = util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
    // Snapshotted tables are streamable: their manifest log is a
    // change feed (KvChangeFeed.scala).
    if (meta.snapshots) caps.add(TableCapability.MICRO_BATCH_READ)
    caps
  }

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    // Size-based streaming admission (`spark.readStream
    // .option("maxBytesPerTrigger", "128m")`): at 100 TB a
    // commit-per-batch replay is O(commits) micro-batches; a bytes
    // target makes it O(data / target). Batch reads ignore it.
    val maxBytes = Option(options.get("maxBytesPerTrigger")).map { v =>
      val b = org.apache.spark.network.util.JavaUtils
        .byteStringAsBytes(v)
      require(b > 0, s"maxBytesPerTrigger must be positive; got $v")
      b
    }
    // `scan_files` (comma-separated member names): restrict the scan
    // to exactly these committed files — the read half of the
    // SELECTIVE maintenance rewrite (KvAutoCompact), which must read
    // only the small files it merges, never the whole table.
    val scanFiles = Option(options.get("scan_files")).map(
      _.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    new KvScanBuilder(path, buckets, meta.snapshots, pinnedVersion,
      maxBytesPerTrigger = maxBytes, branch = branch,
      partitionSpec = meta.partition, scanFilesOnly = scanFiles)
  }

  /** SQL row-level DML (DELETE / UPDATE / MERGE) via the GROUP-BASED
    * (copy-on-write) protocol: Catalyst rewrites the command into a
    * distributed query computing the surviving rows of the affected
    * groups and hands them to this operation's write, whose commit
    * REPLACES those groups atomically. This table is one group (no
    * partitioning metadata), so the write is truncate-and-publish
    * under the existing two-phase commit — the same shape
    * Delta/Iceberg use per file-group, and the rewrite query itself
    * is an ordinary distributed plan (scan + anti-condition filter /
    * merge join), never a driver-side row loop.
    */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(pinnedVersion.isEmpty,
      s"cannot run row-level DML against a time-travel snapshot: ${name()}")
    if (meta.mor)
      // MERGE-ON-READ (TBLPROPERTIES 'dml'='mor'): the delta-based
      // protocol — positional tombstones committed beside the data,
      // applied at scan time; a 0.1% DELETE writes 0.1% tombstone
      // lines instead of rewriting whole file groups. KvMerge.scala.
      () => new KvMorRowLevelOperation(path, info.command(), buckets)
    else
      () => new KvRowLevelOperation(path, info.command(),
        buckets, meta.snapshots, meta.sorted)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty,
      s"cannot write to a time-travel snapshot: ${name()}")
    // WRITE-AUDIT-PUBLISH staging: `.option("branch", "audit")`
    // targets the branch's manifest lineage (KvBranches.scala) — the
    // files publish to the table dir as usual but ONLY the branch's
    // manifests reference them, so main readers never see the commit
    // until system.fast_forward adopts it.
    val writeBranch = Option(info.options.get("branch"))
    writeBranch.foreach { b =>
      require(meta.snapshots,
        s"branch writes need a snapshotted table ($path is not)")
      require(KvBranches.exists(path, b),
        s"no branch '$b' of $path (branches: " +
          s"${KvBranches.list(path).mkString(", ")}) — " +
          "CALL system.create_branch first")
    }
    // Fail at plan time, not mid-write, on a schema the sink can't
    // hold: the incoming row shape must match the table's CURRENT
    // columns type-for-type (names are the caller's business — a
    // format-path save of differently-named columns of the right
    // types has always worked).
    val s = info.schema()
    val want = KvSchema.currentCols(path)
    require(
      s.length == want.length &&
        s.zip(want).forall { case (f, c) =>
          // normalize: the registry's array types are canonically
          // containsNull=true, but a query writing `array(1.0, 2.0)`
          // legitimately carries containsNull=false — a strictly
          // MORE nullable sink column always holds it
          KvSchema.normalize(f.dataType) == c.dtype },
      s"kvjsonl sink at $path writes " +
        s"${KvSchema.toStruct(want).catalogString}; got ${s.catalogString}")
    // Maintenance rewrites (system.rewrite_buckets / rebucket) OWN
    // their placement: `.option("layout_rewrite", "true")` suppresses
    // the standing distribution requests below — the procedure's
    // explicit repartition decides file boundaries (a global-key
    // ordered distribution would re-shuffle a range-split rewrite,
    // and AQE would then coalesce it to one task) — while a plain
    // key-ascending ordering is still REQUIRED, which keeps every
    // per-bucket file sorted (any subsequence of a key-sorted task
    // stream is key-sorted).
    val layoutRewrite = "true" == info.options.get("layout_rewrite")
    // `maintenance=true` (set ONLY by the system.* rewrite
    // procedures): the commit is flagged live-rows-unchanged, so the
    // `$changes` CDC table emits nothing for it (KvSnapshots
    // .commitWith has the full contract). Independent of
    // layout_rewrite — compact/cluster/zorder keep their standing
    // distributions but are maintenance all the same.
    val maint = "true" == info.options.get("maintenance")
    // `maintenance_base=<version>` (set by the system.* procedures):
    // the snapshot version the rewrite SCANNED. The commit refuses to
    // publish against any other base — the exact guard against a
    // concurrent commit landing between the rewrite's read and its
    // publish, which a truncate-replace would otherwise silently
    // drop AND (being maintenance-flagged) hide from CDC. A refused
    // rewrite is simply re-run; at 100 TB compaction racing a
    // streaming append is the common case, not the corner.
    val maintBase: Option[Int] =
      Option(info.options.get("maintenance_base")).map(_.toInt)
    require(maintBase.isEmpty || maint,
      "maintenance_base is only meaningful on a maintenance commit")
    // `replace_files` (comma-separated member names): GROUP-SELECTIVE
    // maintenance commit — membership keeps every file NOT named and
    // swaps exactly the named set for this write's output (the same
    // replaceOnly protocol the row-level DML commit uses, including
    // its fail-loud conflict check when a named file was concurrently
    // replaced). The write half of the selective compaction: a policy
    // that could only truncate-replace the WHOLE table would rewrite
    // 100 TB on every trigger.
    val replaceFiles: Option[Set[String]] =
      Option(info.options.get("replace_files")).map(
        _.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    require(replaceFiles.isEmpty || (maint && meta.snapshots),
      "replace_files is a maintenance option on snapshotted tables")
    new WriteBuilder with SupportsTruncate {
      // mode("overwrite") plans as truncate-then-append; the actual
      // delete happens DRIVER-SIDE at commit time so a failed job
      // never leaves the target half-cleared (abort keeps old files).
      private var truncateFirst = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = (buckets, meta.partition) match {
        case _ if layoutRewrite =>
          new Write with RequiresDistributionAndOrdering {
            override def requiredDistribution()
                : org.apache.spark.sql.connector.distributions.Distribution =
              org.apache.spark.sql.connector.distributions.Distributions
                .unspecified()
            override def requiredOrdering()
                : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
              Array(
                org.apache.spark.sql.connector.expressions.Expressions
                  .sort(
                    org.apache.spark.sql.connector.expressions.Expressions
                      .column(keyName),
                    org.apache.spark.sql.connector.expressions
                      .SortDirection.ASCENDING))
            override def toBatch: BatchWrite =
              new KvJsonlBatchWrite(path, truncateFirst, info.queryId(),
                writeBranch,
                replaceOnly = replaceFiles.map(s => () => s),
                maintenance = maint,
                requireBase = maintBase)
            override def toStreaming: streaming.StreamingWrite =
              throw new UnsupportedOperationException(
                "layout_rewrite is a batch-maintenance option")
          }
        // COMPOSED layout (months(ts) × bucket(n, key)): request
        // clustering by BOTH transforms, so each task sees ~one
        // (unit, bucket) cell and writes ~one file. Correctness never
        // depends on it — the composed fan-out writer routes any
        // distribution.
        case (Some(n), Some((unit, id))) if viaCatalog =>
          val pcolName = cols.find(_.id == id).map(_.name).getOrElse(
            throw new IllegalStateException(
              s"partition field id $id missing from the schema of $path"))
          new Write with RequiresDistributionAndOrdering {
            override def requiredDistribution()
                : org.apache.spark.sql.connector.distributions.Distribution =
              org.apache.spark.sql.connector.distributions.Distributions
                .clustered(Array(
                  KvJsonlTable.partTransform(unit, pcolName),
                  org.apache.spark.sql.connector.expressions.Expressions
                    .bucket(n, keyName)))
            override def requiredOrdering()
                : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
              Array.empty
            override def toBatch: BatchWrite =
              new KvJsonlBatchWrite(path, truncateFirst, info.queryId(),
                writeBranch, maintenance = maint,
                requireBase = maintBase)
            override def toStreaming: streaming.StreamingWrite = {
              require(writeBranch.isEmpty,
                "streaming append to a BRANCH is not supported")
              new KvJsonlStreamingWrite(path, info.queryId())
            }
          }
        // Bucketed table reached through the catalog: REQUEST the
        // clustered-by-bucket distribution (Spark shuffles incoming
        // rows by the V2 bucket function before the write), so each
        // task sees ~one bucket and writes ~one file — the layout a
        // 100 TB bucketed write needs. Correctness never depends on
        // it (the fan-out writer routes any distribution); it's the
        // file-count optimization. Only on the catalog path because
        // resolving the bucket transform needs the FunctionCatalog —
        // a format/path write to a bucketed dir still bucket-routes,
        // it just can't ask for the pre-shuffle.
        case (Some(n), _) if viaCatalog =>
          new Write with RequiresDistributionAndOrdering {
            override def requiredDistribution()
                : org.apache.spark.sql.connector.distributions.Distribution =
              org.apache.spark.sql.connector.distributions.Distributions
                .clustered(Array(
                  org.apache.spark.sql.connector.expressions.Expressions
                    .bucket(n, keyName)))
            // A SORTED bucketed table ('write.sort'='key' + buckets)
            // additionally requests (bucket, key) task ordering: a
            // task's rows arrive grouped by bucket and key-ascending
            // within each group, so every bucket FILE lands sorted —
            // what lets the scan report SupportsReportOrdering and a
            // co-bucketed sort-merge join skip its sorts on top of
            // its exchanges.
            override def requiredOrdering()
                : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
              if (meta.sorted) {
                import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
                Array(
                  Expressions.sort(Expressions.bucket(n, keyName),
                    SortDirection.ASCENDING),
                  Expressions.sort(Expressions.column(keyName),
                    SortDirection.ASCENDING))
              } else Array.empty
            override def toBatch: BatchWrite =
              new KvJsonlBatchWrite(path, truncateFirst, info.queryId(),
                writeBranch, maintenance = maint,
                requireBase = maintBase)
            override def toStreaming: streaming.StreamingWrite = {
              require(writeBranch.isEmpty,
                "streaming append to a BRANCH is not supported")
              new KvJsonlStreamingWrite(path, info.queryId())
            }
          }
        // Date-partitioned catalog write: REQUEST clustering by the
        // partition transform (Spark resolves it through this
        // catalog's days/months function and shuffles rows by unit
        // before the write), so each task writes ~one file per unit
        // value instead of every task fanning out across all of them
        // — the file-count control a date-partitioned 100 TB write
        // needs. Correctness never depends on it: the fan-out writer
        // routes any distribution (format-path writes still route).
        case (None, Some((unit, id))) if viaCatalog =>
          val pcolName = cols.find(_.id == id).map(_.name).getOrElse(
            throw new IllegalStateException(
              s"partition field id $id missing from the schema of $path"))
          new Write with RequiresDistributionAndOrdering {
            override def requiredDistribution()
                : org.apache.spark.sql.connector.distributions.Distribution =
              org.apache.spark.sql.connector.distributions.Distributions
                .clustered(Array(
                  KvJsonlTable.partTransform(unit, pcolName)))
            override def requiredOrdering()
                : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
              Array.empty
            override def toBatch: BatchWrite =
              new KvJsonlBatchWrite(path, truncateFirst, info.queryId(),
                writeBranch, maintenance = maint,
                requireBase = maintBase)
            override def toStreaming: streaming.StreamingWrite = {
              require(writeBranch.isEmpty,
                "streaming append to a BRANCH is not supported")
              new KvJsonlStreamingWrite(path, info.queryId())
            }
          }
        // SORTED table (TBLPROPERTIES 'write.sort'='key'): every batch
        // write requests a GLOBAL key order — range distribution +
        // in-partition sort — so each task emits one file with a key
        // range disjoint from every sibling's and the manifest zone
        // maps prune from the FIRST INSERT, no system.cluster call
        // needed (Iceberg's write.sort-order as a standing property).
        case _ if meta.sorted =>
          new Write with RequiresDistributionAndOrdering {
            private val keyAsc =
              org.apache.spark.sql.connector.expressions.Expressions
                .sort(
                  org.apache.spark.sql.connector.expressions.Expressions
                    .column(keyName),
                  org.apache.spark.sql.connector.expressions
                    .SortDirection.ASCENDING)
            override def requiredDistribution()
                : org.apache.spark.sql.connector.distributions.Distribution =
              org.apache.spark.sql.connector.distributions.Distributions
                .ordered(Array(keyAsc))
            override def requiredOrdering()
                : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
              Array(keyAsc)
            override def toBatch: BatchWrite =
              new KvJsonlBatchWrite(path, truncateFirst, info.queryId(),
                writeBranch, maintenance = maint,
                requireBase = maintBase)
            override def toStreaming: streaming.StreamingWrite = {
              require(writeBranch.isEmpty,
                "streaming append to a BRANCH is not supported")
              new KvJsonlStreamingWrite(path, info.queryId())
            }
          }
        case _ => new Write {
          // The per-write queryId is baked into batch final names so an
          // APPEND write can never collide with (and REPLACE) an earlier
          // job's same-numbered partitions.
          override def toBatch: BatchWrite =
            new KvJsonlBatchWrite(path, truncateFirst, info.queryId(),
              writeBranch, maintenance = maint,
                requireBase = maintBase)
          override def toStreaming: streaming.StreamingWrite = {
            require(writeBranch.isEmpty,
              "streaming append to a BRANCH is not supported — stream " +
                "to main, or stage with batch writes and fast_forward")
            new KvJsonlStreamingWrite(path, info.queryId())
          }
        }
      }
    }
  }
}

/** One published file: temp path, final name, and the per-file
  * statistics the task tracked while writing (row count + min/max
  * over non-null keys — the manifest ZONE MAP a 100 TB planner reads
  * instead of the data).
  */
case class KvWrittenFile(
    tempFile: String, finalName: String, rows: Long,
    minKey: Option[Long], maxKey: Option[Long],
    colStats: Map[Int, Option[(String, String)]] = Map.empty,
    blooms: Map[Int, KvBloom.Bloom] = Map.empty,
    /** False for STRING-keyed tables: their key has no long zone map,
      * and the manifest must record the distinction EXPLICITLY —
      * minKey=None with keysKnown=true means "provably no non-null
      * keys" and licenses zone-map skipping under IsNotNull(key),
      * which would silently drop every row of a string-keyed file.
      */
    keyStatsKnown: Boolean = true)

/** Per-file stat accumulation shared by the plain and bucketed
  * writers — ONE definition of what the manifest records. Beyond the
  * key zone map, every EVOLVED fixed-domain column (bigint / double /
  * timestamp / date, id > 2) gets a per-file min/max tracked in the
  * same single pass — the manifest-level data skipping parquet
  * footers give every column, recovered for the line format. Stats
  * are keyed by FIELD ID (rename-proof, like the schema registry);
  * a double column that saw a NaN records NO stats (unknown — NaN
  * breaks range reasoning, and "didn't skip" is the only safe
  * failure direction).
  */
final class KvKeyStats(
    cols: Seq[KvSchema.Col] = KvSchema.Legacy,
    bloomIds: Seq[Int] = Nil) {
  import org.apache.spark.sql.types.{DateType, DoubleType, LongType,
    StringType, TimestampType}

  private var rows = 0L
  private var minKey = Long.MaxValue
  private var maxKey = Long.MinValue
  private var hasKeys = false
  /** STRING-keyed tables track no key zone map (no safe token format
    * for string bounds in the unescaped manifest; blooms and hash
    * buckets carry their point lookups instead) — the written file
    * says so explicitly (KvWrittenFile.keyStatsKnown).
    */
  private val keyIsLong = KvSchema.keyType(cols) == LongType

  private final class Track(
      val id: Int, val ord: Int, val isDouble: Boolean,
      val isDate: Boolean) {
    var has = false
    var nan = false
    var minL = Long.MaxValue
    var maxL = Long.MinValue
    var minD = java.lang.Double.POSITIVE_INFINITY
    var maxD = java.lang.Double.NEGATIVE_INFINITY
  }

  private val tracked: Array[Track] =
    cols.iterator.zipWithIndex.collect {
      case (c, i) if c.id > 2 &&
          (c.dtype == LongType || c.dtype == TimestampType ||
            c.dtype == DateType || c.dtype == DoubleType) =>
        new Track(c.id, i, c.dtype == DoubleType, c.dtype == DateType)
    }.toArray

  /** Bloom-tracked columns (table meta `blooms`, KvBloom.scala):
    * value hashes accumulate in the same single pass the zone maps
    * use; the filters are built once at task commit. STRING, BIGINT,
    * TIMESTAMP, DATE and DOUBLE columns qualify (enforced at DDL —
    * every point-lookup-able scalar; the temporal types hash their
    * int64 storage tokens, doubles their normalized bit pattern), the
    * key never (its zone maps already skip point lookups on
    * sorted/clustered data).
    */
  private val bloomTracked
      : Array[(Int, Int, org.apache.spark.sql.types.DataType,
        KvBloom.Builder)] =
    cols.iterator.zipWithIndex.collect {
      // the key column (id 1) qualifies only when STRING: a string
      // key has no zone map, so the bloom sidecar is what carries its
      // point lookups; a long key's zone maps already skip on
      // sorted/clustered data and stay bloom-free
      case (c, i) if (c.id > 1 ||
            (c.id == 1 && c.dtype == StringType)) &&
          bloomIds.contains(c.id) &&
          (c.dtype == StringType || c.dtype == LongType ||
            c.dtype == TimestampType || c.dtype == DateType ||
            c.dtype == DoubleType) =>
        (c.id, i, c.dtype, new KvBloom.Builder)
    }.toArray

  def update(row: InternalRow): Unit = {
    rows += 1
    if (keyIsLong && !row.isNullAt(0)) {
      val k = row.getLong(0)
      if (k < minKey) minKey = k
      if (k > maxKey) maxKey = k
      hasKeys = true
    }
    var j = 0
    while (j < tracked.length) {
      val t = tracked(j)
      if (!row.isNullAt(t.ord)) {
        if (t.isDouble) {
          val v = row.getDouble(t.ord)
          if (java.lang.Double.isNaN(v)) t.nan = true
          else {
            if (v < t.minD) t.minD = v
            if (v > t.maxD) t.maxD = v
            t.has = true
          }
        } else {
          val v =
            if (t.isDate) row.getInt(t.ord).toLong else row.getLong(t.ord)
          if (v < t.minL) t.minL = v
          if (v > t.maxL) t.maxL = v
          t.has = true
        }
      }
      j += 1
    }
    j = 0
    while (j < bloomTracked.length) {
      val (_, ord, dtype, builder) = bloomTracked(j)
      if (!row.isNullAt(ord))
        builder.add(dtype match {
          case StringType =>
            KvBloom.hashBytes(row.getUTF8String(ord).getBytes)
          case DoubleType => KvBloom.hashDouble(row.getDouble(ord))
          case DateType => KvBloom.hashLong(row.getInt(ord).toLong)
          // LongType and TimestampType: the storage token is the long
          case _ => KvBloom.hashLong(row.getLong(ord))
        })
      j += 1
    }
  }

  def written(tempFile: String, finalName: String): KvWrittenFile =
    KvWrittenFile(tempFile, finalName, rows,
      if (hasKeys) Some(minKey) else None,
      if (hasKeys) Some(maxKey) else None,
      keyStatsKnown = keyIsLong,
      blooms = bloomTracked.iterator.flatMap { case (id, _, _, b) =>
        b.result().map(id -> _)
      }.toMap, // field-id keyed, unchanged across the type widening
      colStats = tracked.iterator.flatMap { t =>
        if (t.nan) None // unknown — never a basis for skipping
        else if (!t.has) Some(t.id -> None) // known all-null
        else Some(t.id -> Some((
          if (t.isDouble) t.minD.toString else t.minL.toString,
          if (t.isDouble) t.maxD.toString else t.maxL.toString)))
      }.toMap)
}

case class KvJsonlCommitMessage(file: KvWrittenFile)
    extends WriterCommitMessage

/** Bucketed task message: one written file per bucket the task saw.
  * Publish semantics are identical — the driver renames exactly the
  * named files.
  */
case class KvJsonlBucketedCommitMessage(files: Seq[KvWrittenFile])
    extends WriterCommitMessage

class KvJsonlBatchWrite(
    path: String, truncateFirst: Boolean, jobId: String,
    branch: Option[String] = None,
    replaceOnly: Option[() => Set[String]] = None,
    maintenance: Boolean = false,
    requireBase: Option[Int] = None)
    extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val tmp = KvJsonlSink.tempDir(path, jobId)
    java.nio.file.Files.createDirectories(tmp)
    // Bucket/day routing is decided by the TABLE DIR's metadata, not
    // the caller, so every write path (catalog insert, DML rewrite,
    // format-path save) keeps a bucketed table bucketed and a
    // partitioned table partitioned. The column registry is captured
    // HERE (driver-side, once per job) so every task of this write
    // formats rows against the same schema version even if an ALTER
    // lands mid-job.
    val meta = KvBucketing.readMetaFull(path)
    // During a bucket-count evolution (system.rebucket) writers route
    // by the TARGET count: the rewrite itself and any interleaved
    // append land new-generation files, while scans claim Unknown
    // until the publish flips `buckets` (KvBucketing.KvMeta).
    new KvJsonlWriterFactory(path, jobId,
      meta.rebucketTarget.orElse(meta.buckets),
      KvSchema.currentCols(path), meta.partition, meta.blooms)
  }

  /** Driver-side publish: ONLY files named in commit messages become
    * visible. Rename is per-file; the `_SUCCESS` manifest written last
    * is the read-side completeness marker (the standard Hadoop
    * committer contract).
    *
    * TRUNCATE ordering (unsnapshotted tables): PUBLISH the replacement
    * files first, THEN sweep the stale ones. A directory-listing
    * reader concurrent with the window between the two steps sees a
    * SUPERSET (old and new together — transient duplicates, the same
    * window shape INSERT OVERWRITE has always had on listing-based
    * sources); it can never see a HOLE (rows missing from both
    * generations), which the delete-first ordering allowed. Final
    * names carry the per-write queryId, so a replacement can never
    * collide with a stale name. Snapshotted tables have no window at
    * all — truncate is LOGICAL (replaced files stay for prior
    * versions; membership flips atomically with the manifest).
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Paths.get(path)
    val snapshots = KvBucketing.readMetaFull(path).snapshots
    // GROUP-SELECTIVE row-level commit: replace exactly the files the
    // rewrite SCAN planned (every pruned file held pure survivors and
    // stays). Resolved lazily — the scan plans before any write task
    // runs, the thunk reads its report at commit time. Selective
    // rewrites never publish 0-row replacement files (a scanned file
    // whose every row was deleted is simply DROPPED from membership;
    // an eager writer's empty temp is not data) — without this, an
    // all-pruned DML would still commit one empty file as a new
    // version.
    val replaced: Option[Set[String]] = replaceOnly.map(_.apply())
    val published = {
      val all = messages.flatMap {
        case KvJsonlCommitMessage(file) => Seq(file)
        case KvJsonlBucketedCommitMessage(files) => files
      }
      if (replaced.isDefined) all.filter(_.rows > 0L) else all
    }
    publishFiles(dir, published)
    if (replaced.exists(_.isEmpty) && published.isEmpty) {
      // the DML condition pruned EVERY file — a provable no-op;
      // don't churn a new identical snapshot version
      KvJsonlSink.cleanupJobTemp(path, jobId)
      java.nio.file.Files.write(
        dir.resolve("_SUCCESS"), Array.emptyByteArray)
      return
    }
    if (!snapshots) {
      if (replaced.isDefined)
        replaced.get.foreach { n =>
          java.nio.file.Files.deleteIfExists(dir.resolve(n))
          KvBloom.deleteSidecarOf(dir.resolve(n))
        }
      else if (truncateFirst)
        sweepStale(dir, published.map(_.finalName).toSet)
    }
    if (snapshots) {
      // OCC append commit: the previous membership is computed INSIDE
      // the conditional-put retry, so a loser rebases onto the
      // winner's version instead of dropping its files (a truncate
      // re-proposes just its own files at the next version — two
      // overlapping INSERT OVERWRITEs serialize last-writer-wins,
      // the SQL semantics). A group-selective DML rebases too, but
      // FAILS LOUD if a concurrent commit replaced one of its scanned
      // files — committing anyway would resurrect rows the other
      // writer removed or lose its rewrite.
      def nextMembership(prev: Seq[KvSnapshots.KvFileStat])
          : Seq[KvSnapshots.KvFileStat] = {
        val kept = replaced match {
          case Some(scanned) =>
            val names = prev.map(_.name).toSet
            val gone = scanned -- names
            if (gone.nonEmpty)
              throw new KvSnapshots.CommitConflictException(
                s"group-selective rewrite of $path scanned files a " +
                  s"concurrent commit replaced: ${gone.mkString(", ")}")
            prev.filterNot(st => scanned(st.name))
          case None => if (truncateFirst) Seq.empty else prev
        }
        kept ++ published.map(f =>
          KvSnapshots.KvFileStat(f.finalName, f.rows, f.minKey, f.maxKey,
            colStats = f.colStats,
            keysKnown = f.keyStatsKnown))
      }
      branch match {
        // Branch-targeted write (write-audit-publish): the commit
        // lands on the BRANCH's lineage; main's manifests — and every
        // main reader — are untouched by construction.
        case Some(b) =>
          KvBranches.commit(path, b) { head =>
            nextMembership(KvBranches.membersWithStats(path, b, head))
          }
        case None =>
          KvSnapshots.commitWith(path, maintenance) { base =>
            // The BASE PIN (maintenance_base): a maintenance rewrite
            // must publish against exactly the version it scanned —
            // any other base means a concurrent commit interleaved,
            // and this truncate-replace would drop its changes while
            // the flag hides the damage from CDC. Exact where the
            // row-count interlock below is only a heuristic (a
            // concurrent +N/−N pair nets to zero); the count check
            // stays as the spoof backstop for flagged writes that
            // carry no pin.
            requireBase.foreach { b0 =>
              if (base != b0)
                throw new KvSnapshots.CommitConflictException(
                  s"maintenance rewrite of $path scanned v$b0 but " +
                    s"would publish against v$base — a concurrent " +
                    "commit interleaved; re-run the maintenance call")
            }
            val prev =
              if (base == 0) Seq.empty
              else KvSnapshots.membersWithStats(path, base)
            val next = nextMembership(prev)
            // The maintenance flag's commit-time INTERLOCK: flagged
            // commits are CDC-invisible, so a flagged write that
            // actually changed the live row set would silently
            // desynchronize every CDC consumer. Manifest row counts
            // are exact (the writer tracked them), so prove the
            // no-op before publishing; unknown counts (migrated
            // pre-snapshot files, rows = -1) can't prove and fail
            // the flag rather than trust it. (A count-level check is
            // a HEURISTIC — see the base pin above for the exact
            // interleaving guard the system.* procedures ride.)
            if (maintenance) {
              def live(m: Seq[KvSnapshots.KvFileStat]): Option[Long] =
                if (m.exists(_.rows < 0)) None
                else Some(
                  KvSnapshots.dataFiles(m).map(_.rows).sum -
                    KvSnapshots.deleteFiles(m).map(_.rows).sum)
              (live(prev), live(next)) match {
                case (Some(a), Some(b)) if a == b => ()
                case (a, b) => throw new IllegalStateException(
                  s"maintenance-flagged commit to $path does not " +
                    s"preserve the live row set (before=$a after=$b) " +
                    "— refusing to hide it from the change feeds")
              }
            }
            next
          }
      }
    }
    KvJsonlSink.cleanupJobTemp(path, jobId)
    java.nio.file.Files.write(
      dir.resolve("_SUCCESS"), Array.emptyByteArray)
    // POLICY MAINTENANCE (write.auto_compact): a DATA commit to main
    // re-evaluates the file-count policy; the policy rewrite itself
    // is maintenance-flagged, so it can never re-trigger here.
    if (!maintenance && branch.isEmpty)
      KvAutoCompact.maybeMaintain(path)
  }

  /** Step 1 of the truncate commit (package-visible so the
    * reader-during-replace spec can drive the window between the two
    * steps deterministically): move every committed temp file to its
    * final name.
    */
  private[graft] def publishFiles(
      dir: java.nio.file.Path, published: Seq[KvWrittenFile]): Unit =
    published.foreach { f =>
      java.nio.file.Files.move(
        java.nio.file.Paths.get(f.tempFile),
        dir.resolve(f.finalName),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // Bloom sidecar published AFTER its data file: a reader racing
      // the window sees data without sidecar = "unknown, don't skip"
      // — the safe direction. (Sidecar before data would have no
      // window to be wrong in either, but this order needs no proof.)
      if (f.blooms.nonEmpty)
        KvBloom.writeSidecar(
          dir.resolve(KvBloom.sidecarName(f.finalName)), f.blooms)
    }

  /** Step 2: delete every data file the replacement didn't publish
    * (and its bloom sidecar — a sidecar's lifetime IS its data
    * file's).
    */
  private[graft] def sweepStale(
      dir: java.nio.file.Path, keep: Set[String]): Unit = {
    val old = java.nio.file.Files.list(dir)
    try old.forEach { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".jsonl") && !keep(n)) {
        java.nio.file.Files.delete(p)
        KvBloom.deleteSidecarOf(p)
      }
    } finally old.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    KvJsonlSink.cleanupJobTemp(path, jobId)
}

class KvJsonlWriterFactory(
    path: String, jobId: String, buckets: Option[Int] = None,
    cols: Seq[KvSchema.Col] = KvSchema.Legacy,
    partition: Option[(KvBucketing.PartUnit, Int)] = None,
    bloomIds: Seq[Int] = Nil)
    extends DataWriterFactory {
  override def createWriter(
      partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = (buckets, partition) match {
    case (Some(n), Some((unit, id))) =>
      new KvJsonlComposedDataWriter(path, jobId, partitionId, taskId,
        n, unit, id, cols, bloomIds)
    case (Some(n), None) =>
      new KvJsonlBucketedDataWriter(path, jobId, partitionId, taskId, n,
        cols, bloomIds)
    case (None, Some((unit, id))) =>
      new KvJsonlPartitionedDataWriter(path, jobId, partitionId,
        taskId, unit, id, cols, bloomIds)
    case _ =>
      new KvJsonlDataWriter(path,
        f"attempt-$jobId-$partitionId%05d-$taskId",
        f"part-$jobId-$partitionId%05d.jsonl",
        jobSubdir = jobId, cols = cols, bloomIds = bloomIds)
  }
}

/** Bucketed task writer: routes each row to its bucket's file
  * (`bucketOf(key, n)` — the same function the scan reports and the
  * catalog serves), opening at most one file per bucket SEEN. Under
  * the write's requested clustered-by-bucket distribution a task sees
  * ~one bucket; without it (format-path writes) the fan-out is the
  * correctness backstop. Same attempt-isolation + driver-publish
  * protocol as the plain writer, just with a per-bucket file list in
  * the commit message.
  */
class KvJsonlBucketedDataWriter(
    path: String, jobId: String, partitionId: Int, taskId: Long, n: Int,
    cols: Seq[KvSchema.Col] = KvSchema.Legacy,
    bloomIds: Seq[Int] = Nil)
    extends DataWriter[InternalRow] {

  // Founding tables keep the byte-identical fast-path formatter.
  private val evolved = cols != KvSchema.Legacy

  private class BucketOut(val temp: java.nio.file.Path) {
    val out: java.io.BufferedWriter =
      java.nio.file.Files.newBufferedWriter(
        temp, java.nio.charset.StandardCharsets.UTF_8)
    val stats = new KvKeyStats(cols, bloomIds)
  }

  private val open =
    scala.collection.mutable.LinkedHashMap.empty[Int, BucketOut]

  private val tempBase = {
    val d = KvJsonlSink.tempDir(path, jobId)
    java.nio.file.Files.createDirectories(d) // idempotent; executor-side
    d
  }

  private def writerFor(b: Int): BucketOut =
    open.getOrElseUpdate(b, new BucketOut(
      tempBase.resolve(
        f"attempt-$jobId-$partitionId%05d-$taskId-b$b%04d")))

  /** Bucket routing by the table's key TYPE — the same two specs the
    * scan claims and the served V2 function evaluates
    * (KvBucketing.bucketOf / bucketOfString), resolved once per task.
    */
  private val keyIsLong =
    KvSchema.keyType(cols) == org.apache.spark.sql.types.LongType

  override def write(row: InternalRow): Unit = {
    val b =
      if (keyIsLong)
        KvBucketing.bucketOf(
          if (row.isNullAt(0)) null else Long.box(row.getLong(0)), n)
      else
        KvBucketing.bucketOfString(
          if (row.isNullAt(0)) null else row.getUTF8String(0), n)
    val w = writerFor(b)
    w.out.write(
      if (evolved) KvSchema.formatRow(row, cols)
      else KvJsonlSink.formatLine(row))
    w.out.write('\n')
    w.stats.update(row)
  }

  override def write(meta: InternalRow, row: InternalRow): Unit =
    write(row)

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_.out.close())
    KvJsonlBucketedCommitMessage(
      open.toSeq.sortBy(_._1).map { case (b, w) =>
        w.stats.written(
          w.temp.toString,
          f"part-$jobId-$partitionId%05d${KvBucketing.bucketSuffix(b)}.jsonl")
      })
  }

  override def abort(): Unit =
    open.values.foreach { w =>
      w.out.close()
      java.nio.file.Files.deleteIfExists(w.temp)
    }

  override def close(): Unit = ()
}

/** Temporally-partitioned task writer: routes each row to its
  * UNIT's file (`partSuffix(partToken(...))` — the same token the
  * scan's partition pruning parses back from the name), opening at
  * most one file per unit value SEEN. Under the write's requested
  * clustered-by-transform distribution a task sees ~one value;
  * without it (format-path writes) the fan-out is the correctness
  * backstop — the bucketed writer's exact shape, keyed by day/month
  * instead of bucket. NULL partition values route to the explicit
  * `null` partition file.
  */
class KvJsonlPartitionedDataWriter(
    path: String, jobId: String, partitionId: Int, taskId: Long,
    unit: KvBucketing.PartUnit, partitionFieldId: Int,
    cols: Seq[KvSchema.Col],
    bloomIds: Seq[Int] = Nil)
    extends DataWriter[InternalRow] {

  private val evolved = cols != KvSchema.Legacy

  /** The partition column's row ordinal and date-ness, resolved once
    * (the write schema was validated type-for-type against `cols`).
    */
  private val partIdx = cols.indexWhere(_.id == partitionFieldId)
  require(partIdx >= 0,
    s"partition field id $partitionFieldId missing from the write " +
      s"schema of $path")
  private val partIsDate =
    cols(partIdx).dtype == org.apache.spark.sql.types.DateType

  private class DayOut(val temp: java.nio.file.Path) {
    val out: java.io.BufferedWriter =
      java.nio.file.Files.newBufferedWriter(
        temp, java.nio.charset.StandardCharsets.UTF_8)
    val stats = new KvKeyStats(cols, bloomIds)
  }

  private val open =
    scala.collection.mutable.LinkedHashMap.empty[Option[Long], DayOut]

  private val tempBase = {
    val d = KvJsonlSink.tempDir(path, jobId)
    java.nio.file.Files.createDirectories(d) // idempotent; executor-side
    d
  }

  private def writerFor(tok: Option[Long]): DayOut =
    open.getOrElseUpdate(tok, new DayOut(
      tempBase.resolve(
        f"attempt-$jobId-$partitionId%05d-$taskId" +
          KvBucketing.partSuffix(tok, unit))))

  override def write(row: InternalRow): Unit = {
    val raw: Option[Long] =
      if (row.isNullAt(partIdx)) None
      else if (partIsDate) Some(row.getInt(partIdx).toLong)
      else Some(row.getLong(partIdx))
    val w = writerFor(KvBucketing.partToken(raw, partIsDate, unit))
    w.out.write(
      if (evolved) KvSchema.formatRow(row, cols)
      else KvJsonlSink.formatLine(row))
    w.out.write('\n')
    w.stats.update(row)
  }

  override def write(meta: InternalRow, row: InternalRow): Unit =
    write(row)

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_.out.close())
    KvJsonlBucketedCommitMessage(
      open.toSeq.sortBy(_._1.getOrElse(Long.MinValue)).map {
        case (tok, w) =>
          w.stats.written(
            w.temp.toString,
            f"part-$jobId-$partitionId%05d" +
              s"${KvBucketing.partSuffix(tok, unit)}.jsonl")
      })
  }

  override def abort(): Unit =
    open.values.foreach { w =>
      w.out.close()
      java.nio.file.Files.deleteIfExists(w.temp)
    }

  override def close(): Unit = ()
}

/** COMPOSED-layout task writer (`PARTITIONED BY (months(ts),
  * bucket(n, key))` — the standard 100 TB fact layout: temporal unit
  * for retention/pruning, hash bucket for exchange-free joins):
  * routes each row to its (unit value, bucket) file, the product of
  * the two single-transform writers' routings. The final name
  * carries BOTH tokens — partition first, bucket last
  * (`-m334-b0007.jsonl`) — so the partition pruner and the bucket
  * grouper each parse their own suffix independently; neither
  * machinery knows the other exists. Under the write's requested
  * clustered-by-(unit, bucket) distribution a task sees ~one cell;
  * without it the fan-out is the correctness backstop, as for the
  * single-transform writers.
  */
class KvJsonlComposedDataWriter(
    path: String, jobId: String, partitionId: Int, taskId: Long,
    n: Int, unit: KvBucketing.PartUnit, partitionFieldId: Int,
    cols: Seq[KvSchema.Col],
    bloomIds: Seq[Int] = Nil)
    extends DataWriter[InternalRow] {

  private val evolved = cols != KvSchema.Legacy

  private val partIdx = cols.indexWhere(_.id == partitionFieldId)
  require(partIdx >= 0,
    s"partition field id $partitionFieldId missing from the write " +
      s"schema of $path")
  private val partIsDate =
    cols(partIdx).dtype == org.apache.spark.sql.types.DateType
  private val keyIsLong =
    KvSchema.keyType(cols) == org.apache.spark.sql.types.LongType

  private class CellOut(val temp: java.nio.file.Path) {
    val out: java.io.BufferedWriter =
      java.nio.file.Files.newBufferedWriter(
        temp, java.nio.charset.StandardCharsets.UTF_8)
    val stats = new KvKeyStats(cols, bloomIds)
  }

  private val open =
    scala.collection.mutable.LinkedHashMap.empty[(Option[Long], Int), CellOut]

  private val tempBase = {
    val d = KvJsonlSink.tempDir(path, jobId)
    java.nio.file.Files.createDirectories(d) // idempotent; executor-side
    d
  }

  private def suffix(cell: (Option[Long], Int)): String =
    KvBucketing.partSuffix(cell._1, unit) +
      KvBucketing.bucketSuffix(cell._2)

  private def writerFor(cell: (Option[Long], Int)): CellOut =
    open.getOrElseUpdate(cell, new CellOut(
      tempBase.resolve(
        f"attempt-$jobId-$partitionId%05d-$taskId${suffix(cell)}")))

  override def write(row: InternalRow): Unit = {
    val raw: Option[Long] =
      if (row.isNullAt(partIdx)) None
      else if (partIsDate) Some(row.getInt(partIdx).toLong)
      else Some(row.getLong(partIdx))
    val b =
      if (keyIsLong)
        KvBucketing.bucketOf(
          if (row.isNullAt(0)) null else Long.box(row.getLong(0)), n)
      else
        KvBucketing.bucketOfString(
          if (row.isNullAt(0)) null else row.getUTF8String(0), n)
    val w = writerFor(
      (KvBucketing.partToken(raw, partIsDate, unit), b))
    w.out.write(
      if (evolved) KvSchema.formatRow(row, cols)
      else KvJsonlSink.formatLine(row))
    w.out.write('\n')
    w.stats.update(row)
  }

  override def write(meta: InternalRow, row: InternalRow): Unit =
    write(row)

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_.out.close())
    KvJsonlBucketedCommitMessage(
      open.toSeq
        .sortBy { case ((tok, b), _) =>
          (tok.getOrElse(Long.MinValue), b) }
        .map { case (cell, w) =>
          w.stats.written(
            w.temp.toString,
            f"part-$jobId-$partitionId%05d${suffix(cell)}.jsonl")
        })
  }

  override def abort(): Unit =
    open.values.foreach { w =>
      w.out.close()
      java.nio.file.Files.deleteIfExists(w.temp)
    }

  override def close(): Unit = ()
}

/** Streaming (micro-batch) write path: same attempt-isolation protocol
  * per epoch, with the epoch id baked into BOTH the temp and the final
  * file names. That makes the per-epoch driver commit IDEMPOTENT —
  * after a crash between sink commit and checkpoint offset commit, the
  * restarted query replays the SAME epoch id and the publish renames
  * land on the SAME final names (REPLACE, not duplicate). This is the
  * standard exactly-once contract for a file-based streaming sink;
  * `V2StreamingSinkSpec` drives the restart path end-to-end through a
  * checkpointed query.
  */
class KvJsonlStreamingWrite(path: String, queryId: String = "")
    extends streaming.StreamingWrite {

  private val snapshots = KvBucketing.readMetaFull(path).snapshots

  /** Per-query file tag for SNAPSHOTTED targets. The plain epoch-only
    * names are safe for an unsnapshotted sink (one query owns a plain
    * sink, and a replayed rename REPLACES in place); a snapshotted
    * table keeps REPLACED FILES READABLE for prior versions, so a
    * second query (or a fresh run restarting at epoch 0) landing on
    * the same names would corrupt committed history. The streaming
    * queryId is stable across driver restarts (it rides in the
    * checkpoint), which is exactly what the replay detection needs.
    */
  private val qTag: String =
    if (snapshots) s"q${queryId.replace("-", "")}-" else ""

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory = {
    val meta = KvBucketing.readMetaFull(path)
    // Bucketed / date-partitioned targets stream through the SAME
    // routed writers the batch path uses, with the epoch-scoped job
    // tag as their jobId — file names come out epoch-prefixed AND
    // unit/bucket-suffixed, so replay detection and layout contracts
    // compose. They need snapshots: the manifest commit is what makes
    // a replayed epoch a no-op (an unsnapshotted routed layout has no
    // transactional membership to dedup against).
    require(meta.buckets.isEmpty && meta.partition.isEmpty ||
      meta.snapshots,
      "streaming append to a BUCKETED or DATE-PARTITIONED kvjsonl " +
        s"table requires TBLPROPERTIES ('snapshots'='true'): $path")
    require(!snapshots || queryId.nonEmpty,
      s"snapshotted streaming append to $path needs the query id " +
        "for epoch replay detection")
    java.nio.file.Files.createDirectories(KvJsonlSink.tempDir(path))
    // A named top-level factory: the instance ships to executors, so it
    // must not capture this (non-serializable) driver-side write object.
    KvJsonlStreamingWriterFactory(path, KvSchema.currentCols(path), qTag,
      meta.rebucketTarget.orElse(meta.buckets), meta.partition,
      meta.blooms)
  }

  /** Per-epoch publish. Unsnapshotted: idempotent renames onto
    * epoch-keyed names (replay REPLACES in place). Snapshotted:
    * EXACTLY-ONCE via the manifest — the epoch's files enter
    * membership in ONE OCC manifest commit, and a replayed epoch is
    * detected by its file-name prefix already being a member (all of
    * an epoch's files entered atomically, so any one present ⇒ the
    * epoch committed; the check races nothing, because this query is
    * the only writer of its own epoch names and Spark serializes a
    * query's epochs). A crash BETWEEN rename and manifest commit
    * leaves unreferenced files — invisible to every snapshot reader,
    * re-published (or orphan-swept by system.vacuum) on replay.
    * Concurrent batch INSERTs interleave safely: the OCC loser
    * rebases its membership onto the winner's version, same as any
    * two batch appends.
    */
  override def commit(
      epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Paths.get(path)
    def publish(f: KvWrittenFile): Unit = {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(f.tempFile),
        dir.resolve(f.finalName),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      if (f.blooms.nonEmpty)
        KvBloom.writeSidecar(
          dir.resolve(KvBloom.sidecarName(f.finalName)), f.blooms)
    }
    if (!snapshots) {
      messages.foreach { case KvJsonlCommitMessage(f) => publish(f) }
    } else {
      val prefix = f"part-${qTag}e$epochId%05d-"
      val replayed = KvSnapshots.latest(path).exists(v =>
        KvSnapshots.members(path, v).exists(_.startsWith(prefix)))
      if (!replayed) {
        // 0-row task files never publish: an epoch's manifest commit
        // carries exactly its data, and an all-empty epoch commits
        // NOTHING (no snapshot churn from idle triggers). Routed
        // writers (bucketed / partitioned) report one file per
        // bucket/unit SEEN, so they never produce empties.
        val data = messages.flatMap {
          case KvJsonlCommitMessage(f) => Seq(f)
          case KvJsonlBucketedCommitMessage(fs) => fs
        }.filter(_.rows > 0L)
        if (data.nonEmpty) {
          data.foreach(publish)
          KvSnapshots.commitWith(path) { base =>
            val prev =
              if (base == 0) Seq.empty[KvSnapshots.KvFileStat]
              else KvSnapshots.membersWithStats(path, base)
            prev ++ data.map(f =>
              KvSnapshots.KvFileStat(f.finalName, f.rows, f.minKey,
                f.maxKey, keysKnown = f.keyStatsKnown,
                colStats = f.colStats))
          }
          ()
        }
      }
    }
    dropEpochTemps(epochId) // losing speculative attempts of this epoch
    java.nio.file.Files.write(
      dir.resolve("_SUCCESS"), Array.emptyByteArray)
    // POLICY MAINTENANCE (write.auto_compact): each epoch commit
    // re-evaluates the file-count policy — the trickle-ingest shape
    // the policy exists for (one file per bucket per epoch). Runs
    // synchronously inside the epoch commit (Delta's auto-compaction
    // latency trade) and is epoch-serialized by Spark, so the base
    // pin cannot race this query's own next epoch.
    if (snapshots) KvAutoCompact.maybeMaintain(path)
    ()
  }

  override def abort(
      epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    dropEpochTemps(epochId)

  private def dropEpochTemps(epochId: Long): Unit = {
    val tmp = KvJsonlSink.tempDir(path)
    if (java.nio.file.Files.isDirectory(tmp)) {
      val s = java.nio.file.Files.list(tmp)
      try s.forEach { p =>
        if (p.getFileName.toString
            .startsWith(f"attempt-${qTag}e$epochId%05d-"))
          java.nio.file.Files.deleteIfExists(p)
      } finally s.close()
    }
    // Routed writers (bucketed / partitioned) stage under the
    // epoch-scoped JOB subdir instead of the base temp dir.
    KvJsonlSink.cleanupJobTemp(path, f"${qTag}e$epochId%05d")
  }
}

case class KvJsonlStreamingWriterFactory(
    path: String, cols: Seq[KvSchema.Col] = KvSchema.Legacy,
    qTag: String = "",
    buckets: Option[Int] = None,
    partition: Option[(KvBucketing.PartUnit, Int)] = None,
    bloomIds: Seq[Int] = Nil)
    extends streaming.StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int,
      taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    // Routed targets reuse the batch writers verbatim: the
    // epoch-scoped tag is their jobId, so final names come out
    // `part-q<qid>-e00001-00003-d9862.jsonl` — epoch-prefixed for
    // replay detection, unit/bucket-suffixed for the layout
    // contracts (partition pruning, storage-partitioned joins).
    val epochJob = f"${qTag}e$epochId%05d"
    (buckets, partition) match {
      case (Some(n), Some((unit, id))) =>
        new KvJsonlComposedDataWriter(
          path, epochJob, partitionId, taskId, n, unit, id, cols,
          bloomIds)
      case (Some(n), None) =>
        new KvJsonlBucketedDataWriter(
          path, epochJob, partitionId, taskId, n, cols, bloomIds)
      case (None, Some((unit, id))) =>
        new KvJsonlPartitionedDataWriter(
          path, epochJob, partitionId, taskId, unit, id, cols, bloomIds)
      case _ =>
        new KvJsonlDataWriter(path,
          f"attempt-$epochJob-$partitionId%05d-$taskId",
          f"part-$epochJob-$partitionId%05d.jsonl",
          cols = cols, bloomIds = bloomIds)
    }
  }
}

/** One task attempt's writer: a private temp file keyed by the
  * attempt identity (partition + task, plus epoch when streaming), so
  * a speculative duplicate attempt writes elsewhere and only the
  * attempt whose message reaches the driver is published under the
  * partition's final name.
  */
class KvJsonlDataWriter(
    path: String, tempName: String, finalName: String,
    jobSubdir: String = "",
    cols: Seq[KvSchema.Col] = KvSchema.Legacy,
    bloomIds: Seq[Int] = Nil)
    extends DataWriter[InternalRow] {

  // Founding tables keep the byte-identical fast-path formatter.
  private val evolved = cols != KvSchema.Legacy

  private val tempFile = {
    val d =
      if (jobSubdir.isEmpty) KvJsonlSink.tempDir(path)
      else KvJsonlSink.tempDir(path, jobSubdir)
    java.nio.file.Files.createDirectories(d) // idempotent; executor-side
    d.resolve(tempName)
  }
  private val out = java.nio.file.Files.newBufferedWriter(
    tempFile, java.nio.charset.StandardCharsets.UTF_8)
  private val stats = new KvKeyStats(cols, bloomIds)

  override def write(row: InternalRow): Unit = {
    out.write(
      if (evolved) KvSchema.formatRow(row, cols)
      else KvJsonlSink.formatLine(row))
    out.newLine()
    stats.update(row)
  }

  /** Metadata-carrying variant invoked by the row-level-operation
    * rewrite (DataAndMetadataWritingSparkTask): `meta` is the
    * operation's required metadata projection (`_file`). This sink
    * commits by replacing the whole table, so provenance is
    * discarded; a per-file-group committer would collect it here to
    * scope the replacement.
    */
  override def write(meta: InternalRow, row: InternalRow): Unit =
    write(row)

  override def commit(): WriterCommitMessage = {
    out.close()
    KvJsonlCommitMessage(stats.written(tempFile.toString, finalName))
  }

  override def abort(): Unit = {
    out.close()
    java.nio.file.Files.deleteIfExists(tempFile)
  }

  override def close(): Unit = ()
}
