package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.Base64

import org.apache.spark.sql.sources.{EqualTo, Filter, In}

/** Per-file BLOOM FILTERS for kv tables — point-lookup file skipping
  * on columns zone maps can't help with (high-cardinality strings, or
  * longs uncorrelated with the write order). A min/max range over a
  * file whose values are effectively random spans the whole domain
  * and never prunes; a bloom answers "is THIS value possibly in THIS
  * file" regardless of ordering — parquet's column bloom filters /
  * Iceberg's puffin blobs, recovered for the line format. At 100 TB
  * the target query is `WHERE user_id = X` over thousands of files:
  * zone maps keep ~all of them, a 1%-FPR bloom opens ~1% + the true
  * hits.
  *
  * Layout: one SIDECAR per data file (`<file>.jsonl.bloom`), written
  * by the write TASK beside its temp data file and published by the
  * driver in the same rename pass — the sidecar is immutable with its
  * data file, invisible until published, and reclaimed with it
  * (vacuum/truncate delete it alongside). Sidecars are a pure
  * OPTIMIZATION surface: a missing/corrupt one means "unknown — don't
  * skip", never an error, so enabling blooms on a table with existing
  * files is safe (old files just never skip until compaction rewrites
  * them).
  *
  * Sizing: 10 bits/key, k=6 probes → ~0.8% false positives. Hashing
  * is splitmix64 over the long value (or over an FNV-1a 64 of the
  * UTF-8 bytes for strings) with double-hashing probe derivation —
  * standard public constructions (Steele et al. splitmix; classic
  * Kirsch-Mitzenmacher double hashing).
  */
object KvBloom {

  val BitsPerKey = 10
  val NumProbes = 6

  /** A builder past this many values stops tracking (the sidecar is
    * dropped → the file reads "unknown" and never skips). Backstop
    * against unbounded task memory on a pathological single-file
    * write; at the sink's deployment-scale file sizes this is never
    * hit.
    */
  val MaxTrackedKeys: Int = 8 << 20

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def hashLong(v: Long): Long = splitmix64(v)

  /** DOUBLE values hash over their canonical bit pattern: -0.0
    * normalizes to 0.0 first (SQL equality says they match, so their
    * hashes must), and doubleToLongBits already canonicalizes every
    * NaN payload. TIMESTAMP/DATE need no sibling — their storage
    * tokens ARE longs (micros / epoch days) and hash via [[hashLong]].
    */
  def hashDouble(d: Double): Long =
    splitmix64(java.lang.Double.doubleToLongBits(
      if (d == 0.0d) 0.0d else d))

  /** FNV-1a 64 over the raw bytes, finalized through splitmix64 so
    * short keys still spread across the whole 64-bit space. The WRITE
    * side hashes the row's UTF8String bytes, the SCAN side the
    * predicate literal's UTF-8 bytes — identical bytes by definition
    * of the column's encoding.
    */
  def hashBytes(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) {
      h ^= (b(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    splitmix64(h)
  }

  def hashString(s: String): Long =
    hashBytes(s.getBytes(StandardCharsets.UTF_8))

  /** Immutable built filter: `mBits` is always a positive multiple of
    * 64 (whole words).
    */
  final case class Bloom(k: Int, mBits: Int, words: Array[Long]) {
    def mightContain(hash: Long): Boolean = {
      val h1 = hash
      val h2 = (hash >>> 32) | 1L // odd → full-period probe stride
      var i = 0
      while (i < k) {
        val bit = java.lang.Long.remainderUnsigned(
          h1 + i.toLong * h2, mBits.toLong).toInt
        if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  def build(hashes: Array[Long], n: Int): Bloom = {
    // ≥64 bits even for an empty file (a degenerate m of 0 would
    // divide by zero; an all-zero word answers "no" for everything,
    // which is exact for an empty file)
    val mBits = math.max(64,
      ((n.toLong * BitsPerKey + 63) / 64 * 64)
        .min(Int.MaxValue.toLong / 2).toInt)
    val words = new Array[Long](mBits >>> 6)
    var j = 0
    while (j < n) {
      val h1 = hashes(j)
      val h2 = (h1 >>> 32) | 1L
      var i = 0
      while (i < NumProbes) {
        val bit = java.lang.Long.remainderUnsigned(
          h1 + i.toLong * h2, mBits.toLong).toInt
        words(bit >>> 6) |= (1L << (bit & 63))
        i += 1
      }
      j += 1
    }
    Bloom(NumProbes, mBits, words)
  }

  /** Accumulates one column's value hashes while a file is written;
    * built once at task commit. Oversize → dead (no sidecar entry).
    */
  final class Builder {
    private var hashes = new Array[Long](1024)
    private var n = 0
    private var dead = false

    def add(hash: Long): Unit = {
      if (dead) return
      if (n == MaxTrackedKeys) { dead = true; hashes = null; return }
      if (n == hashes.length) {
        val grown = new Array[Long](
          math.min(hashes.length * 2, MaxTrackedKeys))
        System.arraycopy(hashes, 0, grown, 0, n)
        hashes = grown
      }
      hashes(n) = hash
      n += 1
    }

    def result(): Option[Bloom] =
      if (dead) None else Some(build(hashes, n))
  }

  // ---- sidecar IO -------------------------------------------------

  /** v2 carries a per-line CRC32 of the bitset bytes: a bit flip in a
    * stored sidecar that still base64-decodes would otherwise SKIP a
    * matching file (a cleared bit = silent false negative = lost
    * rows). With the checksum, every corruption direction lands on
    * "unknown — don't skip". Unrecognized headers (incl. v1) read as
    * None for the same reason.
    */
  private val Header = "graft-bloom v2"

  def sidecarName(dataFileName: String): String = dataFileName + ".bloom"

  private def crcOf(bytes: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32
    c.update(bytes)
    c.getValue
  }

  /** Written task-side next to the temp data file; the driver
    * publishes it with the same rename pass as the data file.
    */
  def writeSidecar(to: Path, blooms: Map[Int, Bloom]): Unit = {
    val enc = Base64.getEncoder
    val lines = Header +: blooms.toSeq.sortBy(_._1).map {
      case (id, b) =>
        val bb = java.nio.ByteBuffer.allocate(b.words.length * 8)
        b.words.foreach(bb.putLong)
        val bytes = bb.array()
        s"$id ${b.k} ${b.mBits} ${enc.encodeToString(bytes)} " +
          s"${crcOf(bytes)}"
    }
    Files.write(to, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** None on any structural problem OR checksum mismatch — a sidecar
    * is an optimization, so unreadable means "unknown", never an
    * error and never a skip.
    */
  def readSidecar(file: Path): Option[Map[Int, Bloom]] = {
    if (!Files.isRegularFile(file)) return None
    try {
      val lines = new String(
        Files.readAllBytes(file), StandardCharsets.UTF_8).split('\n')
      if (lines.isEmpty || lines(0) != Header) return None
      Some(lines.drop(1).filter(_.nonEmpty).map { l =>
        val Array(id, k, m, b64, crc) = l.split(' ')
        val bytes = Base64.getDecoder.decode(b64)
        require(crcOf(bytes) == crc.toLong, "sidecar checksum mismatch")
        val bb = java.nio.ByteBuffer.wrap(bytes)
        val words = new Array[Long](bytes.length / 8)
        var i = 0
        while (i < words.length) { words(i) = bb.getLong; i += 1 }
        val bloom = Bloom(k.toInt, m.toInt, words)
        require(bloom.mBits == words.length * 64)
        id.toInt -> bloom
      }.toMap)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Reclaim a data file's sidecar alongside the file — called by
    * every path that deletes published data files (vacuum, truncate
    * sweep, selective-DML delete, DROP TABLE is recursive anyway).
    */
  def deleteSidecarOf(dataFile: Path): Unit = {
    Files.deleteIfExists(
      dataFile.resolveSibling(sidecarName(dataFile.getFileName.toString)))
    ()
  }
}

/** Scan-side bloom pruning: tests pushed equality predicates on the
  * table's bloom columns against each candidate file's sidecar. Every
  * failure direction (no sidecar, no column entry, unreadable) keeps
  * the file.
  */
object KvBloomPrune {

  /** Files skipped by bloom sidecars in this JVM (spec/gate
    * observability counter, same shape as KvZoneMap.prunedFiles).
    */
  val prunedFiles = new java.util.concurrent.atomic.AtomicLong

  /** The (field id, required hashes) conjuncts compiled from pushed
    * filters: for the file to survive, EVERY conjunct needs at least
    * one of its hashes possibly-present (EqualTo → one hash; In →
    * any of its values).
    */
  def compile(
      filters: Array[Filter],
      bloomIds: Seq[Int],
      cols: Seq[KvSchema.Col]): Seq[(Int, Array[Long])] = {
    if (bloomIds.isEmpty || filters.isEmpty) return Nil
    def colOf(attr: String): Option[KvSchema.Col] =
      cols.find(c => c.name == attr && bloomIds.contains(c.id))
    def hashOf(c: KvSchema.Col, v: Any): Option[Long] = v match {
      case null => None
      case s: String
          if c.dtype == org.apache.spark.sql.types.StringType =>
        Some(KvBloom.hashString(s))
      case l: Long
          if c.dtype == org.apache.spark.sql.types.LongType =>
        Some(KvBloom.hashLong(l))
      case i: Int if c.dtype == org.apache.spark.sql.types.LongType =>
        Some(KvBloom.hashLong(i.toLong))
      case d: Double
          if c.dtype == org.apache.spark.sql.types.DoubleType =>
        Some(KvBloom.hashDouble(d))
      // TIMESTAMP/DATE literals → the column's int64 storage token,
      // via the SAME conversions the evolved-column predicate compiler
      // uses (KvExtraPredicate.token) — write-side and scan-side hash
      // identical longs by construction.
      case _ if c.dtype == org.apache.spark.sql.types.TimestampType ||
          c.dtype == org.apache.spark.sql.types.DateType =>
        KvExtraPredicate.token(c.dtype, v).map(KvBloom.hashLong)
      case _ => None
    }
    filters.toSeq.flatMap {
      case EqualTo(a, v) =>
        for (c <- colOf(a); h <- hashOf(c, v)) yield (c.id, Array(h))
      case In(a, vs) if vs.nonEmpty =>
        colOf(a).flatMap { c =>
          val hs = vs.flatMap(v => hashOf(c, v))
          // a NULL or unhashable literal in the list → incomplete
          // disjunction → can't prune on this filter
          if (hs.length == vs.length) Some((c.id, hs)) else None
        }
      case _ => None
    }
  }

  /** Compile a RUNTIME V2 predicate (IN / = over a bloom column with
    * materialized literals — what SupportsRuntimeV2Filtering hands a
    * scan after the selective join side runs) to a (field id,
    * candidate hashes) conjunct. None = unparseable = no pruning from
    * this predicate — the only safe failure direction, as everywhere
    * in this file.
    */
  def compileV2(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate,
      bloomIds: Seq[Int],
      cols: Seq[KvSchema.Col]): Option[(Int, Array[Long])] = {
    import org.apache.spark.sql.connector.expressions.{Expression, Literal, NamedReference}
    def colOf(e: Expression): Option[KvSchema.Col] = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        cols.find(c =>
          c.name == r.fieldNames.head && bloomIds.contains(c.id))
      case _ => None
    }
    def hashOf(c: KvSchema.Col, e: Expression): Option[Long] = e match {
      case l: Literal[_] if l.value != null =>
        // V2 predicate literals carry Spark's INTERNAL values — which
        // for timestamp/date are exactly the int64/int32 storage
        // tokens this format writes, so they hash directly.
        (c.dtype, l.value) match {
          case (org.apache.spark.sql.types.StringType,
              s: org.apache.spark.unsafe.types.UTF8String) =>
            Some(KvBloom.hashBytes(s.getBytes))
          case (org.apache.spark.sql.types.LongType,
              v: java.lang.Long) =>
            Some(KvBloom.hashLong(v.longValue))
          case (org.apache.spark.sql.types.TimestampType,
              v: java.lang.Long) =>
            Some(KvBloom.hashLong(v.longValue))
          case (org.apache.spark.sql.types.DateType,
              v: java.lang.Integer) =>
            Some(KvBloom.hashLong(v.longValue))
          case (org.apache.spark.sql.types.DoubleType,
              v: java.lang.Double) =>
            Some(KvBloom.hashDouble(v.doubleValue))
          case _ => None
        }
      case _ => None
    }
    p.name() match {
      case "IN" =>
        val children = p.children()
        if (children.length < 2) None
        else colOf(children.head).flatMap { c =>
          val hs = children.tail.map(hashOf(c, _))
          // any unhashable/NULL literal → incomplete disjunction →
          // can't prune on this predicate
          if (hs.forall(_.isDefined)) Some((c.id, hs.flatten))
          else None
        }
      case "=" =>
        p.children() match {
          case Array(a, b) =>
            colOf(a).flatMap(c => hashOf(c, b).map(h =>
              (c.id, Array(h))))
              .orElse(colOf(b).flatMap(c => hashOf(c, a).map(h =>
                (c.id, Array(h)))))
          case _ => None
        }
      case _ => None
    }
  }

  /** May file `name` (under table dir `path`) match every compiled
    * conjunct? Loads the sidecar at most once per call site pass.
    */
  def mayMatch(
      path: String, name: String,
      conjuncts: Seq[(Int, Array[Long])]): Boolean = {
    if (conjuncts.isEmpty) return true
    KvBloom.readSidecar(
      Paths.get(path, KvBloom.sidecarName(name))) match {
      case None => true // unknown — never a basis for skipping
      case Some(blooms) =>
        conjuncts.forall { case (id, hashes) =>
          blooms.get(id) match {
            case None => true // column not tracked in this file
            case Some(b) => hashes.exists(b.mightContain)
          }
        }
    }
  }
}
