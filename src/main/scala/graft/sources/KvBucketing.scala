package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}

/** Bucket partitioning for kvjsonl tables — the layout that makes
  * STORAGE-PARTITIONED JOINS possible: two tables bucketed the same
  * way on `key` join with ZERO shuffle, because Spark's
  * KeyGroupedPartitioning machinery proves both scans already cluster
  * rows identically (SPARK-37377, the Iceberg bucket-join shape). At
  * 100 TB the join shuffle is usually THE dominant cost of a fact-fact
  * join; bucketing both tables at write time pays one clustered write
  * and then every subsequent co-keyed join is exchange-free.
  *
  * The bucket function is `floorMod(key, n)` (null key → bucket 0) —
  * deliberately transparent rather than a murmur-style hash, because
  * every participant must agree on it EXACTLY and the specs verify
  * row placement by recomputing it: the writer routes rows with it,
  * the scan reports it as the partition transform, and the V2
  * FunctionCatalog serves it to Catalyst so plans can (a) prove two
  * scans compatible via `canonicalName` and (b) evaluate it when a
  * write requests `Distributions.clustered(bucket(n, key))`. A skewed
  * long domain would want the hash variant; the machinery is
  * identical.
  *
  * Bucketed tables keep the connector's FLAT file layout — the bucket
  * id is carried in the file NAME (`part-...-b0003.jsonl`), not a
  * subdirectory — so every existing code path (truncate, compact
  * listing, `_file` provenance, the two-phase commit) works unchanged
  * on bucketed tables.
  */
object KvBucketing {

  /** Table-level metadata, one tiny JSON file per table dir. Absent ⇒
    * unpartitioned, unsnapshotted (every pre-existing table).
    */
  val MetaFile = "_meta.json"

  /** Full table meta: optional bucket partitioning, the snapshots
    * (time-travel) flag — see KvSnapshots.scala — the DML mode:
    * `mor` = MERGE-ON-READ row-level operations (positional delete
    * files applied at scan time, SupportsDelta) instead of the
    * default copy-on-write group rewrite (MoR requires snapshots —
    * delete files are manifest-tracked members of a version) — and
    * optional DATE PARTITIONING: `partitionDays` holds the FIELD ID
    * (rename-proof, like the schema registry) of the TIMESTAMP/DATE
    * column the table is `PARTITIONED BY (days(col))` over. Like
    * buckets, the partition value is carried in the file NAME
    * (`part-...-d9862.jsonl`, epoch days), keeping the flat layout
    * every existing code path works on.
    */
  case class KvMeta(
      buckets: Option[Int], snapshots: Boolean, mor: Boolean = false,
      partitionDays: Option[Int] = None) {
    def isEmpty: Boolean =
      buckets.isEmpty && !snapshots && !mor && partitionDays.isEmpty
  }

  /** The connector's bucket spec. Null keys go to bucket 0 (they can
    * never satisfy an equi-join, so their placement only needs to be
    * deterministic, not balanced).
    */
  def bucketOf(key: java.lang.Long, n: Int): Int =
    if (key == null) 0 else java.lang.Math.floorMod(key.longValue, n.toLong).toInt

  def writeMeta(dir: String, meta: KvMeta): Unit = {
    require(!meta.isEmpty, "refusing to write an empty table meta")
    val fields =
      meta.buckets.map(n => s""""buckets":$n""").toSeq ++
        (if (meta.snapshots) Seq(""""snapshots":true""") else Seq.empty) ++
        (if (meta.mor) Seq(""""dml":"mor"""") else Seq.empty) ++
        meta.partitionDays.map(id => s""""pdays":$id""").toSeq
    // Temp + atomic rename, same as the manifest commit: an in-place
    // rewrite (ALTER flipping the snapshots flag) interrupted mid-write
    // would leave a truncated meta that bricks every subsequent access.
    val tmp = java.nio.file.Paths.get(dir, MetaFile + ".tmp")
    java.nio.file.Files.write(tmp,
      fields.mkString("{", ",", "}").getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp,
      java.nio.file.Paths.get(dir, MetaFile),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def writeMeta(dir: String, buckets: Int): Unit =
    writeMeta(dir, KvMeta(Some(buckets), snapshots = false))

  private val BucketsField = """"buckets":(\d+)""".r
  private val SnapshotsField = """"snapshots":true""".r
  private val MorField = """"dml":"mor"""".r
  private val PdaysField = """"pdays":(\d+)""".r

  def readMetaFull(dir: String): KvMeta = {
    val p = java.nio.file.Paths.get(dir, MetaFile)
    if (!java.nio.file.Files.isRegularFile(p))
      KvMeta(None, snapshots = false)
    else {
      val s = new String(
        java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8).trim
      require(s.startsWith("{") && s.endsWith("}"),
        s"corrupt $MetaFile in $dir: $s")
      val fields = s.substring(1, s.length - 1).split(',').toSeq
        .filter(_.nonEmpty)
      // Strict field set: an unknown field is corruption (this file
      // is only ever written by writeMeta), never silently ignored.
      val meta = fields.foldLeft(KvMeta(None, snapshots = false)) {
        case (m, BucketsField(n)) => m.copy(buckets = Some(n.toInt))
        case (m, SnapshotsField()) => m.copy(snapshots = true)
        case (m, MorField()) => m.copy(mor = true)
        case (m, PdaysField(id)) => m.copy(partitionDays = Some(id.toInt))
        case (_, other) => throw new IllegalArgumentException(
          s"corrupt $MetaFile field in $dir: $other")
      }
      require(!meta.isEmpty, s"corrupt (empty) $MetaFile in $dir: $s")
      meta
    }
  }

  def readMeta(dir: String): Option[Int] = readMetaFull(dir).buckets

  private val BucketInName = """-b(\d+)\.jsonl$""".r

  /** Final-name suffix the bucketed writer appends; [[fileBucket]] is
    * its exact inverse on the file NAME (not path).
    */
  def bucketSuffix(bucket: Int): String = f"-b$bucket%04d"

  def fileBucket(fileName: String): Option[Int] =
    BucketInName.findFirstMatchIn(fileName).map(_.group(1).toInt)

  val MicrosPerDay: Long = 86400L * 1000 * 1000

  /** A partitioned write's day token for one row's partition-column
    * value: epoch days (timestamps floor toward -∞, so pre-1970
    * values land on the right calendar day), None for NULL rows.
    */
  def dayToken(
      micros: Option[Long], isDate: Boolean): Option[Long] =
    micros.map(v =>
      if (isDate) v else java.lang.Math.floorDiv(v, MicrosPerDay))

  private val DayInName = """-d(-?\d+|null)\.jsonl$""".r

  /** Day-partition suffix; [[fileDay]] is its exact inverse. The
    * token is epoch days; `null` marks the null partition (rows whose
    * partition column is NULL — they can never satisfy a comparison,
    * so a day-range prune always skips them).
    */
  def daySuffix(tok: Option[Long]): String =
    s"-d${tok.fold("null")(_.toString)}"

  /** None = no day token in the name; Some(None) = the null
    * partition; Some(Some(d)) = day d.
    */
  def fileDay(fileName: String): Option[Option[Long]] =
    DayInName.findFirstMatchIn(fileName).map { m =>
      val g = m.group(1)
      if (g == "null") None else Some(g.toLong)
    }
}

/** The `days` V2 function the kv catalog serves through
  * FunctionCatalog — resolving the scan/write-reported `days(col)`
  * transform is what lets a catalog write request
  * `Distributions.clustered(days(col))`: Spark shuffles incoming rows
  * by day BEFORE the write, so each task sees ~one day and writes ~one
  * file per day instead of every task fanning out across all days —
  * the file-count control a date-partitioned 100 TB write needs.
  */
class KvDaysUnbound extends UnboundFunction {
  override def name(): String = "days"
  override def description(): String =
    "days(col): epoch days of a timestamp/date — kvjsonl partition spec"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1 &&
      (inputType(0).dataType ==
        org.apache.spark.sql.types.TimestampType ||
        inputType(0).dataType == org.apache.spark.sql.types.DateType),
      s"days expects (TIMESTAMP) or (DATE); got ${inputType.catalogString}")
    new KvDaysBound(
      isDate = inputType(0).dataType ==
        org.apache.spark.sql.types.DateType)
  }
}

class KvDaysBound(isDate: Boolean) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] =
    Array(
      if (isDate) org.apache.spark.sql.types.DateType
      else org.apache.spark.sql.types.TimestampType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "days"
  override def canonicalName(): String = "graft.kv.days"
  override def isResultNullable: Boolean = true
  override def isDeterministic: Boolean = true

  override def produceResult(input: InternalRow): Integer =
    if (input.isNullAt(0)) null
    else if (isDate) Int.box(input.getInt(0))
    else Int.box(java.lang.Math.floorDiv(
      input.getLong(0), KvBucketing.MicrosPerDay).toInt)
}

/** The `bucket` V2 function the kv catalog serves through
  * FunctionCatalog — Catalyst resolves the scan-reported
  * `bucket(n, key)` transform against THIS object: equality of
  * [[KvBucketBound.canonicalName]] across two scans is what lets
  * EnsureRequirements prove their KeyGroupedPartitionings compatible
  * (the storage-partitioned join), and `produceResult` is what the
  * shuffle evaluates when a write requests clustering by the
  * transform.
  */
class KvBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, key): floorMod(key, n) — kvjsonl bucket spec"

  override def bind(inputType: StructType): BoundFunction = {
    require(
      inputType.length == 2 &&
        inputType(0).dataType == IntegerType &&
        inputType(1).dataType == LongType,
      s"bucket expects (INT n, BIGINT key); got ${inputType.catalogString}")
    new KvBucketBound
  }
}

class KvBucketBound extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] =
    Array(IntegerType, LongType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.kv.bucket"
  override def isResultNullable: Boolean = false
  override def isDeterministic: Boolean = true

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val key: java.lang.Long =
      if (input.isNullAt(1)) null else Long.box(input.getLong(1))
    Int.box(KvBucketing.bucketOf(key, n))
  }
}

/** Spec/gate observability for the runtime-filter path (single-JVM
  * counters, the local stand-in for custom task metrics).
  */
object KvRuntimeFilter {
  /** Files whose bucket a runtime join-key filter proved empty of
    * matches — whole-file I/O skipped at the planning of a
    * runtime-filtered scan.
    */
  val prunedFiles = new java.util.concurrent.atomic.AtomicLong
  /** Rows skipped by the reader's runtime key-set check (the
    * row-level residue of the runtime filter on files that DID need
    * opening).
    */
  val rowSkips = new java.util.concurrent.atomic.AtomicLong
}
