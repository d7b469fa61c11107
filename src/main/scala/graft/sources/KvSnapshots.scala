package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** Snapshot manifests for kvjsonl tables — the TIME-TRAVEL layer
  * (`SELECT ... FROM t VERSION AS OF n`, Delta/Iceberg's shape,
  * reduced to its essentials):
  *
  *   - table membership is defined by `_snapshots/v%05d.manifest`
  *     (one committed file NAME per line), not by directory listing;
  *   - every batch commit writes the NEXT manifest atomically
  *     (temp + rename) instead of deleting replaced files, so every
  *     prior version stays readable until explicitly expired;
  *   - a read resolves the latest manifest — or a PINNED one, when
  *     the catalog was asked for `VERSION AS OF` / `TIMESTAMP AS OF`;
  *   - `system.expire_snapshots` is the reclamation half: drop old
  *     manifests, then delete files no surviving manifest references.
  *
  * Snapshots are OPT-IN per table (`TBLPROPERTIES
  * ('snapshots'='true')`): tables without the flag keep the original
  * list-the-directory semantics and byte-identical commit behavior.
  * Manifest publication runs under OPTIMISTIC CONCURRENCY CONTROL
  * ([[commitWith]]): a conditional put (create-exclusive link) of the
  * next manifest name detects a concurrent committer, and the loser
  * rebases its membership against the winner's version and retries —
  * two racing appends both land, in a linear version history, with no
  * lost update (KvOccSpec forces the collision deterministically).
  */
object KvSnapshots {

  val DirName = "_snapshots"

  private def snapDir(path: String): Path = Paths.get(path, DirName)

  // 5+ digits: the %05d formatting grows naturally past v99999, and
  // a fixed-width pattern would silently stop LISTING those versions
  // (latest() frozen, new commits re-numbering over the same file).
  private val ManifestName = """v(\d{5,})\.manifest""".r

  /** Dir-parameterized core, shared with the branch lineages
    * (KvBranches.scala): a branch is the same manifest machinery
    * rooted at `_snapshots/branch-<name>/` instead of `_snapshots/`.
    */
  private[sources] def versionsIn(d: Path): Seq[Int] = {
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case ManifestName(v) => v.toInt }
        .toSeq.sorted
      finally s.close()
    }
  }

  def versions(path: String): Seq[Int] = versionsIn(snapDir(path))

  def latest(path: String): Option[Int] = versions(path).lastOption

  private[sources] def manifestPathIn(d: Path, version: Int): Path =
    d.resolve(f"v$version%05d.manifest")

  private def manifestPath(path: String, version: Int): Path =
    manifestPathIn(snapDir(path), version)

  /** Per-file statistics a manifest line carries beside the name —
    * the ZONE MAP of this format: row count, and min/max over the
    * file's non-null keys. All recorded for free at commit time (each
    * write task tracked them while writing) and the basis of the
    * manifest-only planner surfaces: exact `numRows`, the
    * metadata-answered COUNT/MIN/MAX pushdown (KvAggScan), and
    * file-level skipping of key predicates (the row-group-stats skip
    * parquet gets from its footers, recovered for a plain line
    * format). `rows` = -1 means unknown (a migrated pre-snapshot
    * file — tolerated on read, never written by the sink);
    * `minKey`/`maxKey` absent means no non-null keys OR unknown —
    * both directions must only ever DISABLE an optimization.
    */
  /** `colStats` extends the key zone map to EVOLVED fixed-domain
    * columns (bigint / double / timestamp / date): field id →
    * `Some((minTok, maxTok))` with both tokens EXACT over the file's
    * non-null, non-NaN values, or `None` = the file has NO non-null
    * values in that column (skippable under every null-rejecting
    * comparison). A column ABSENT from the map is UNKNOWN — never a
    * basis for skipping (old manifests, migrated files, NaN-bearing
    * double columns). Tokens stay STRINGS at this layer: the manifest
    * is schema-agnostic; the scan parses them against the column's
    * dtype (long tokens compared as longs — a double round-trip of a
    * >2^53 bigint under a STRICT comparison could skip a matching
    * file).
    */
  case class KvFileStat(
      name: String, rows: Long,
      minKey: Option[Long], maxKey: Option[Long],
      keysKnown: Boolean,
      colStats: Map[Int, Option[(String, String)]] = Map.empty)

  /** Manifest line: `name<TAB>rows<TAB>min<TAB>max` when the writer
    * tracked key stats — `-` is the EXPLICIT known-keyless marker (the
    * file has no non-null keys), distinct from a 2-field line, which
    * means the stats are UNKNOWN (a migrated pre-snapshot file). The
    * distinction is load-bearing: known-keyless files may be zone-map
    * skipped under key predicates; unknown files never may. A
    * STRING-keyed table's files write `s` in both bound fields —
    * key stats NOT APPLICABLE (no safe token format for string
    * bounds), parsed as keysKnown=false so no key predicate ever
    * zone-skips them — which keeps the FIFTH field available: the
    * optional per-column zone maps, `id:min:max` / `id:-` (known
    * all-null) pairs joined by `,`, sorted by id — absent pairs (and
    * the absent field) mean unknown.
    */
  def membersWithStats(
      path: String, version: Int): Seq[KvFileStat] =
    membersWithStatsIn(snapDir(path), version, path)

  /** Read a branch's manifest instead of main's when `branch` is set
    * — the one switch every branch-capable read path goes through.
    */
  def membersWithStats(
      path: String, version: Int,
      branch: Option[String]): Seq[KvFileStat] =
    branch match {
      case None => membersWithStats(path, version)
      case Some(b) => KvBranches.membersWithStats(path, b, version)
    }

  private[sources] def membersWithStatsIn(
      d: Path, version: Int, what: String): Seq[KvFileStat] = {
    val m = manifestPathIn(d, version)
    require(Files.isRegularFile(m),
      s"no snapshot v$version of $what (versions: " +
        s"${versionsIn(d).mkString(", ")})")
    def bound(s: String): Option[Long] =
      if (s == "-" || s == "s") None else Some(s.toLong)
    Files.readAllLines(m, java.nio.charset.StandardCharsets.UTF_8)
      .asScala.toSeq.filter(_.nonEmpty)
      // header lines (the `#maintenance` flag) are commit metadata,
      // not members
      .filterNot(_.startsWith("#"))
      .map { line =>
        line.split('\t') match {
          case Array(name) =>
            KvFileStat(name, -1L, None, None, keysKnown = false)
          case Array(name, n) =>
            KvFileStat(name, n.toLong, None, None, keysKnown = false)
          case Array(name, n, mn, mx) =>
            KvFileStat(name, n.toLong, bound(mn), bound(mx),
              keysKnown = mn != "s")
          case Array(name, n, mn, mx, cs) =>
            KvFileStat(name, n.toLong, bound(mn), bound(mx),
              keysKnown = mn != "s",
              colStats = decodeColStats(cs, what))
          case _ => throw new IllegalArgumentException(
            s"corrupt manifest line in v$version of $what: $line")
        }
      }
  }

  def membersWithCounts(
      path: String, version: Int): Seq[(String, Long)] =
    membersWithStats(path, version).map(s => (s.name, s.rows))

  /** A manifest records two member kinds, told apart by extension:
    * `.jsonl` data files and `.del` POSITIONAL DELETE files (the
    * merge-on-read tombstones — `rows` is the tombstone count,
    * key stats never apply). Splitting is the single point every
    * consumer goes through, so a new kind can't silently leak into a
    * data-file code path.
    */
  def isDeleteFile(name: String): Boolean = name.endsWith(".del")

  def dataFiles(stats: Seq[KvFileStat]): Seq[KvFileStat] =
    stats.filterNot(s => isDeleteFile(s.name))

  def deleteFiles(stats: Seq[KvFileStat]): Seq[KvFileStat] =
    stats.filter(s => isDeleteFile(s.name))

  /** Parse one positional-delete file: `dataFileName<TAB>pos` lines →
    * positions per data file NAME. Tombstones are small by
    * construction (one line per deleted row, no values), which is
    * what makes loading them at scan PLANNING affordable — the same
    * delete-file-index-at-planning shape Iceberg's MoR reads use.
    */
  def readDeleteFile(path: String, name: String): Map[String, Seq[Long]] =
    Files.readAllLines(
      Paths.get(path, name), java.nio.charset.StandardCharsets.UTF_8)
      .asScala.toSeq.filter(_.nonEmpty)
      .map { line =>
        val i = line.indexOf('\t')
        require(i > 0, s"corrupt delete-file line in $name: $line")
        (line.substring(0, i), line.substring(i + 1).toLong)
      }
      .groupMap(_._1)(_._2)

  /** The merged tombstone index of a version: data file name → SORTED
    * positions of its deleted rows, across every delete file the
    * manifest lists. Positions are unique by construction (a row is
    * tombstoned at most once — later DML never sees it again), so no
    * dedup pass is needed; sortedness is what lets the reader apply
    * them in one sequential merge.
    */
  def deleteIndex(path: String, version: Int): Map[String, Array[Long]] =
    deleteIndex(path, version, None)

  def deleteIndex(
      path: String, version: Int,
      branch: Option[String]): Map[String, Array[Long]] =
    deleteIndexOf(path, membersWithStats(path, version, branch))

  /** [[deleteIndex]] over an ALREADY-PARSED membership — the variant
    * a scan that caches its manifest parse uses, so building the
    * tombstone index never re-parses the manifest it came from.
    */
  def deleteIndexOf(
      path: String,
      stats: Seq[KvFileStat]): Map[String, Array[Long]] = {
    val dels = deleteFiles(stats)
    if (dels.isEmpty) Map.empty
    else dels
      .flatMap(d => readDeleteFile(path, d.name).toSeq)
      .groupMapReduce(_._1)(_._2)(_ ++ _)
      .map { case (f, ps) => f -> ps.distinct.toArray.sorted }
  }

  /** File NAMES of snapshot `version` (fail-loud on a version no
    * manifest records — a time-travel read of a never-committed or
    * expired version).
    */
  def members(path: String, version: Int): Seq[String] =
    membersWithStats(path, version).map(_.name)

  /** Non-throwing variant for consumers that can tolerate an EXPIRED
    * version (the change feed's at-least-once resume semantics).
    */
  def membersIfPresent(
      path: String, version: Int): Option[Seq[String]] =
    if (Files.isRegularFile(manifestPath(path, version)))
      Some(members(path, version))
    else None

  /** Commit conflict the OCC publish could not resolve within its
    * retry budget (or that the caller declared non-rebaseable).
    */
  final class CommitConflictException(msg: String)
      extends RuntimeException(msg)

  /** Publish the next snapshot under OPTIMISTIC CONCURRENCY CONTROL —
    * the conditional-put commit every production table format runs:
    *
    *   1. read the current latest version `base`;
    *   2. the caller's `membership(base)` computes the FULL member
    *     list for base+1 AGAINST that base (an append re-reads base's
    *     members and adds its files; a truncate ignores base);
    *   3. publish atomically at base+1 via create-exclusive
    *     (`Files.createLink` — link(2) fails EEXIST atomically, the
    *     local-FS conditional put). A loser's link fails ⇒ some other
    *     writer won base+1 ⇒ RETRY from step 1 against the new base,
    *     so the loser's commit REBASES instead of overwriting the
    *     winner — no lost update, and the version history stays
    *     linear by construction.
    *
    * The temp file carries a per-attempt unique suffix so racing
    * writers never collide on it either. Returns the committed
    * version.
    */
  def commitWith(path: String)(
      membership: Int => Seq[KvFileStat]): Int =
    commitWithIn(snapDir(path))(membership)

  /** MAINTENANCE-flagged commit: same OCC protocol, with the flag
    * encoded IN THE MANIFEST CONTENT itself (a `#maintenance` header
    * line — Delta's dataChange=false / Iceberg's snapshot operation
    * living inside committed metadata). It records that this commit's
    * LIVE ROW SET is provably identical to its predecessor's —
    * compaction, clustering, z-order, per-bucket rewrite, rebucket —
    * so the `$changes` CDC table emits NOTHING for flagged versions:
    * without it, a file-granular changelog must restate every
    * surviving row of a rewritten file, and at 100 TB that makes one
    * compaction emit the whole table as phantom CDC. Living inside
    * the manifest bytes makes the flag ATOMIC with the commit by
    * construction — no sidecar-ordering window in which a data
    * commit could strip a valid marker or a losing maintenance
    * attempt's marker could attach to a row-changing winner. The
    * flag travels nowhere else — time travel, expiry pins, rollback
    * and the metadata tables all treat the version as ordinary.
    */
  def commitWith(path: String, maintenance: Boolean)(
      membership: Int => Seq[KvFileStat]): Int =
    commitWithIn(snapDir(path), maintenance)(membership)

  /** The manifest header line a maintenance commit carries as its
    * FIRST line; header lines (`#`-prefixed) are skipped by the
    * member parser, so pre-header manifests read unchanged.
    */
  private[sources] val MaintenanceHeader = "#maintenance"

  /** Is `version` a maintenance commit? Read from the manifest's
    * first bytes — the flag is part of the committed content, so the
    * answer can never disagree with the commit that won the version.
    * A missing manifest (never committed, or expired) is not a
    * maintenance commit.
    */
  def isMaintenance(path: String, version: Int): Boolean = {
    val m = manifestPath(path, version)
    if (!Files.isRegularFile(m)) false
    else {
      val in = Files.newBufferedReader(
        m, java.nio.charset.StandardCharsets.UTF_8)
      try in.readLine() == MaintenanceHeader
      finally in.close()
    }
  }

  /** Column-stat token charset: numeric toString output only (long or
    * double) — enforced on WRITE so no token can ever hold the pair
    * (`:`), list (`,`) or field (TAB) separators; the manifest format
    * stays unambiguous by construction, not by escaping.
    */
  private val StatTokenRe = "[0-9A-Za-z+.-]+".r

  private[sources] def encodeColStats(
      cs: Map[Int, Option[(String, String)]]): String =
    cs.toSeq.sortBy(_._1).map {
      case (id, None) => s"$id:-"
      case (id, Some((mn, mx))) =>
        require(StatTokenRe.matches(mn) && StatTokenRe.matches(mx),
          s"unencodable column-stat token for field $id: '$mn'/'$mx'")
        s"$id:$mn:$mx"
    }.mkString(",")

  private[sources] def decodeColStats(
      s: String, what: String): Map[Int, Option[(String, String)]] =
    s.split(',').iterator.filter(_.nonEmpty).map { p =>
      p.split(':') match {
        case Array(id, "-") => id.toInt -> None
        case Array(id, mn, mx) =>
          id.toInt -> Some((mn, mx)): (Int, Option[(String, String)])
        case _ => throw new IllegalArgumentException(
          s"corrupt manifest column stats of $what: $p")
      }
    }.toMap

  private def manifestBytes(
      membership: Seq[KvFileStat],
      maintenance: Boolean = false): Array[Byte] = {
    val body = membership.sortBy(_.name)
      .map { st =>
        if (st.keysKnown) {
          val base = s"${st.name}\t${st.rows}" +
            s"\t${st.minKey.getOrElse("-")}\t${st.maxKey.getOrElse("-")}"
          if (st.colStats.isEmpty) base
          else base + "\t" + encodeColStats(st.colStats)
        } else if (st.colStats.nonEmpty)
          // key stats unknown BUT per-column stats present (a
          // STRING-keyed table's files): the `s` key-stat marker
          // keeps the column zone maps without ever licensing a key
          // skip — distinct from `-`, which means "provably no
          // non-null keys" and does license one
          s"${st.name}\t${st.rows}\ts\ts\t" + encodeColStats(st.colStats)
        else s"${st.name}\t${st.rows}"
      }
      .mkString("\n")
    (if (maintenance) MaintenanceHeader + "\n" + body else body)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Single-writer manifest write at a FIXED version (branch
    * creation's seed copy) — create-exclusive, never replaces.
    */
  private[sources] def writeManifestIn(
      d: Path, version: Int, membership: Seq[KvFileStat]): Unit = {
    val tmp = d.resolve(
      f"v$version%05d.manifest.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, manifestBytes(membership))
    Files.createLink(manifestPathIn(d, version), tmp)
    Files.deleteIfExists(tmp)
    ()
  }

  private[sources] def commitWithIn(
      d: Path, maintenance: Boolean = false)(
      membership: Int => Seq[KvFileStat]): Int = {
    Files.createDirectories(d)
    var attempts = 0
    while (true) {
      val base = versionsIn(d).lastOption.getOrElse(0)
      val v = base + 1
      val tmp = d.resolve(
        f"v$v%05d.manifest.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      // The maintenance flag rides INSIDE the manifest bytes (header
      // line), so flag and membership publish in the same atomic
      // link — whichever commit wins the version, its own flag state
      // is what readers see, with no marker-ordering window.
      Files.write(tmp, manifestBytes(membership(base), maintenance))
      try {
        Files.createLink(manifestPathIn(d, v), tmp)
        Files.deleteIfExists(tmp)
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          attempts += 1
          if (attempts >= 50)
            throw new CommitConflictException(
              s"snapshot commit of $d lost $attempts consecutive " +
                "races — giving up (livelocked writer herd?)")
      }
    }
    -1 // unreachable
  }

  /** Fixed-membership commit (the common single-writer call): rebase
    * under conflict re-proposes the SAME membership at the next
    * version — right for truncate/replace semantics and for callers
    * that already hold the full member list.
    */
  def commit(path: String, membership: Seq[KvFileStat]): Int =
    commitWith(path)(_ => membership)

  /** Largest version whose manifest was committed at or before the
    * given microsecond timestamp (the `TIMESTAMP AS OF` resolution).
    * The commit time is rounded UP to the next microsecond, so a
    * sub-microsecond truncation can only ever EXCLUDE a borderline
    * snapshot, never include one committed after the asked-for time.
    */
  /** Commit wall time of a version (manifest mtime, epoch millis) —
    * the `$snapshots` metadata table's `committed_at_ms`.
    */
  def commitMillis(path: String, version: Int): Long =
    Files.getLastModifiedTime(manifestPath(path, version)).toMillis

  def resolveTimestamp(path: String, micros: Long): Int = {
    def commitMicros(v: Int): Long = {
      val t = Files.getLastModifiedTime(manifestPath(path, v)).toInstant
      t.getEpochSecond * 1000000L + (t.getNano + 999L) / 1000L
    }
    val at = versions(path).filter(commitMicros(_) <= micros)
    require(at.nonEmpty,
      s"no snapshot of $path at or before timestamp $micros µs")
    at.last
  }

  /** Reclamation: keep the newest `keepLast` manifests, delete the
    * rest, then delete every data file referenced ONLY by the dropped
    * manifests. Returns (snapshotsBefore, snapshotsAfter,
    * filesDeleted).
    */
  def expire(path: String, keepLast: Int): (Long, Long, Long) = {
    require(keepLast >= 1, s"keep_last must be >= 1, got $keepLast")
    val all = versions(path)
    // TAGGED versions survive expiration however old they get — a
    // tag is a lineage pin (KvRefs.scala); reclaiming one from under
    // a `VERSION AS OF 'name'` reader would be silent data loss. The
    // retained set can therefore be NON-CONTIGUOUS; every
    // history-walking read path tolerates gaps (missing predecessor
    // degrades diffs to initial-snapshot / NULL, never crashes).
    val tagged = KvRefs.taggedVersions(path)
    val tail = all.takeRight(keepLast).toSet
    val keep = all.filter(v => tail(v) || tagged(v))
    val drop = all.filterNot(v => tail(v) || tagged(v))
    // BRANCH manifests (KvBranches.scala) are live references too:
    // expire walks MAIN's lineage only (branch dirs never match the
    // manifest listing), but a file staged on an un-published branch
    // — or shared between a dropped main version and a branch base —
    // must survive until the branch is dropped or fast-forwarded.
    val live: Set[String] =
      keep.flatMap(v => members(path, v)).toSet ++
        KvBranches.referencedFiles(path)
    var deleted = 0L
    drop.foreach { v =>
      members(path, v).foreach { f =>
        if (!live.contains(f) &&
            Files.deleteIfExists(Paths.get(path, f))) {
          KvBloom.deleteSidecarOf(Paths.get(path, f))
          deleted += 1
        }
      }
      Files.deleteIfExists(manifestPath(path, v))
    }
    (all.size.toLong, keep.size.toLong, deleted)
  }
}

/** Zone-map satisfiability: can a file with the given manifest stats
  * contain ANY row matching the predicates? False only on PROOF —
  * unknown stats always pass, so a wrong answer here can only ever
  * mean "didn't skip", never "skipped a match".
  */
object KvZoneMap {
  import org.apache.spark.sql.sources._

  /** Files skipped by manifest zone maps in this JVM (spec/gate
    * observability, like the reader-side counters).
    */
  val prunedFiles = new java.util.concurrent.atomic.AtomicLong

  /** `kn` is the table's CURRENT key-column name (field id 1's
    * display name — KvSchema.keyName): pushed filters carry it, the
    * manifest's min/max key stats are keyed to the role.
    */
  def mayMatch(
      stat: KvSnapshots.KvFileStat, filters: Array[Filter],
      kn: String = "key"): Boolean = {
    if (filters.isEmpty) true
    else if (stat.rows == 0L) false // provably empty
    else if (!stat.keysKnown) true // unknown stats — never skip
    else filters.forall {
      // keysKnown ⇒ min/max are EXACT over non-null keys; absent
      // means the file has no non-null keys, which no null-rejecting
      // key comparison can match.
      case IsNotNull(a) if a == kn => stat.minKey.isDefined
      case EqualTo(a, v: java.lang.Long) if a == kn =>
        stat.minKey.exists(_ <= v.longValue) &&
          stat.maxKey.exists(_ >= v.longValue)
      case GreaterThan(a, v: java.lang.Long) if a == kn =>
        stat.maxKey.exists(_ > v.longValue)
      case GreaterThanOrEqual(a, v: java.lang.Long) if a == kn =>
        stat.maxKey.exists(_ >= v.longValue)
      case LessThan(a, v: java.lang.Long) if a == kn =>
        stat.minKey.exists(_ < v.longValue)
      case LessThanOrEqual(a, v: java.lang.Long) if a == kn =>
        stat.minKey.exists(_ <= v.longValue)
      case _ => true
    }
  }

  /** Per-COLUMN zone maps (KvFileStat.colStats): the same
    * satisfiability test over any evolved fixed-domain column a pushed
    * comparison names. Resolution is name → FIELD ID against the
    * scan's schema version, so stats recorded before a RENAME COLUMN
    * keep pruning after it. Long-token columns (bigint / timestamp /
    * date) compare as longs — routing a >2^53 bigint through double
    * would let a strict comparison skip a matching file; doubles
    * compare as doubles (NaN-bearing files recorded no stats at all).
    * All-null columns (`Some(None)`) fail every null-rejecting
    * comparison; unknown (absent) stats never skip.
    */
  def mayMatchCols(
      stat: KvSnapshots.KvFileStat,
      filters: Array[Filter],
      cols: Seq[KvSchema.Col]): Boolean =
    stat.colStats.isEmpty || filters.isEmpty ||
      filters.forall(f => colFilterMayMatch(stat, cols, f))

  private def colFilterMayMatch(
      stat: KvSnapshots.KvFileStat,
      cols: Seq[KvSchema.Col],
      f: Filter): Boolean = {
    def statsOf(a: String)
        : Option[(KvSchema.Col, Option[(String, String)])] =
      cols.find(c => c.name == a && c.id > 2)
        .flatMap(c => stat.colStats.get(c.id).map(c -> _))
    def cmp(a: String, v: Any)(
        ok: (Long, Long, Long) => Boolean)(
        okD: (Double, Double, Double) => Boolean): Boolean =
      statsOf(a) match {
        case None => true // unknown column or unknown stats
        case Some((_, None)) => false // all-null vs null-rejecting op
        case Some((c, Some((mn, mx)))) =>
          if (c.dtype == org.apache.spark.sql.types.DoubleType) v match {
            // Spark orders NaN LARGER than every double (unlike IEEE,
            // where every NaN comparison is false): `x < NaN` matches
            // every non-NaN row, `= NaN` matches NaN rows. An IEEE
            // range test against a NaN literal would prune files full
            // of matches — a NaN literal never prunes.
            case d: java.lang.Double if !d.isNaN =>
              okD(mn.toDouble, mx.toDouble, d.doubleValue)
            case _ => true
          } else KvExtraPredicate.token(c.dtype, v) match {
            case Some(t) => ok(mn.toLong, mx.toLong, t)
            case None => true
          }
      }
    f match {
      case IsNotNull(a) => statsOf(a) match {
        case Some((_, None)) => false
        case _ => true
      }
      case EqualTo(a, v) =>
        cmp(a, v)((mn, mx, t) => mn <= t && mx >= t)(
          (mn, mx, t) => mn <= t && mx >= t)
      case GreaterThan(a, v) =>
        cmp(a, v)((_, mx, t) => mx > t)((_, mx, t) => mx > t)
      case GreaterThanOrEqual(a, v) =>
        cmp(a, v)((_, mx, t) => mx >= t)((_, mx, t) => mx >= t)
      case LessThan(a, v) =>
        cmp(a, v)((mn, _, t) => mn < t)((mn, _, t) => mn < t)
      case LessThanOrEqual(a, v) =>
        cmp(a, v)((mn, _, t) => mn <= t)((mn, _, t) => mn <= t)
      case _ => true
    }
  }

  /** Double-column comparisons have no reader-side row-skip compile
    * (KvExtraPredicate's token domain is long) but CAN file-prune via
    * [[mayMatchCols]] — this is the pushdown admission test for them.
    * The reader ignores pushed filters it can't compile and Spark
    * re-evaluates every filter, so over-admitting is always safe.
    */
  def supportsCol(f: Filter, cols: Seq[KvSchema.Col]): Boolean = {
    def dbl(a: String, v: Any): Boolean =
      v.isInstanceOf[java.lang.Double] &&
        cols.exists(c => c.name == a && c.id > 2 &&
          c.dtype == org.apache.spark.sql.types.DoubleType)
    f match {
      case EqualTo(a, v) => dbl(a, v)
      case GreaterThan(a, v) => dbl(a, v)
      case GreaterThanOrEqual(a, v) => dbl(a, v)
      case LessThan(a, v) => dbl(a, v)
      case LessThanOrEqual(a, v) => dbl(a, v)
      case IsNotNull(a) =>
        cols.exists(c => c.name == a && c.id > 2 &&
          c.dtype == org.apache.spark.sql.types.DoubleType)
      case _ => false
    }
  }

  /** Runtime join-key set vs the file's key range (the coarse
    * [setMin, setMax] envelope — cheap and sound; the reader's exact
    * per-row membership check handles the rest). Accepts Long or
    * String elements (the runtime set's type follows the key
    * column's): the range compare applies only to an all-Long set —
    * string-keyed files publish keysKnown=false and return true
    * above, and a string set against the impossible remainder
    * (keysKnown=true) falls through to "don't skip".
    */
  def mayMatchKeys(
      stat: KvSnapshots.KvFileStat, keys: Set[_]): Boolean =
    if (stat.rows == 0L) false
    else if (!stat.keysKnown) true
    else if (keys.isEmpty) false
    else {
      val longs = keys.iterator.collect { case l: Long => l }.toSeq
      if (longs.size != keys.size) true
      else (stat.minKey, stat.maxKey) match {
        case (Some(mn), Some(mx)) => longs.min <= mx && longs.max >= mn
        case _ => false // known-keyless file can't equi-match
      }
    }
}
