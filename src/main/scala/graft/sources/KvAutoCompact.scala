package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{coalesce, col, lit, pmod}

/** POLICY-DRIVEN MAINTENANCE — `TBLPROPERTIES
  * ('write.auto_compact'='t')`: after every successful DATA commit
  * (batch append/overwrite/DML and each streaming epoch), the write
  * path checks the live file count and, when any bucket exceeds t
  * data files (or the table exceeds t, unbucketed), runs the SAME
  * maintenance rewrite `system.rewrite_buckets` / `system.compact`
  * would — CDC-invisible (`#maintenance` manifest header), base-
  * pinned (`maintenance_base`: a concurrent commit interleaving with
  * the rewrite aborts it rather than being dropped), bucket-routed
  * and key-sorted where the layout asks. This is Delta's
  * auto-compaction shape: synchronous after the triggering commit,
  * so ingest latency absorbs the maintenance and file counts are
  * BOUNDED BY CONSTRUCTION instead of by an operator remembering to
  * CALL compact — at 100 TB with streaming ingest, a per-epoch file
  * per bucket turns a month of micro-batches into tens of thousands
  * of files per bucket without this.
  *
  * Scope guards: only snapshotted, non-quarantined (no rebucket in
  * flight), non-branch targets; the policy rewrite itself is a
  * maintenance commit and never re-triggers (recursion-free). A lost
  * base-pin race skips the compaction — the NEXT data commit
  * re-evaluates the same policy, so the bound is eventually
  * re-established without ever failing the user's (already
  * committed) write.
  */
object KvAutoCompact {

  /** Policy compactions run in this JVM (gate/spec observability). */
  val compactions = new java.util.concurrent.atomic.AtomicLong

  /** Conflict-skipped policy compactions (observability). */
  val skippedOnConflict = new java.util.concurrent.atomic.AtomicLong

  def maybeCompact(path: String): Unit = {
    val meta = KvBucketing.readMetaFull(path)
    val threshold = meta.autoCompact.getOrElse(return)
    if (!meta.snapshots) return
    // a rebucket in flight owns the layout — the quarantine clears
    // before any policy rewrite may touch placement
    if (meta.rebucketTarget.isDefined) return
    val head = KvSnapshots.latest(path).getOrElse(return)
    val data = KvSnapshots.dataFiles(
      KvSnapshots.membersWithStats(path, head))
    val breach = meta.buckets match {
      case Some(_) =>
        data.groupBy(f => KvBucketing.fileBucket(f.name))
          .values.exists(_.size > threshold)
      case None => data.size > threshold
    }
    if (!breach) return
    val spark = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .getOrElse(return)
    val keyName = KvSchema.keyNameOf(path)
    val src = spark.read
      .format("graft.sources.KvJsonlSink")
      .load(path)
    // One file per bucket (or per table): policy compaction targets
    // the small files streaming/trickle commits leave, which re-merge
    // to well under a file-size bound by construction. Tables whose
    // buckets outgrow single files are the manual
    // rewrite_buckets(target_files_per_bucket) territory — a standing
    // policy must never surprise-rewrite 100 TB into range splits.
    val shaped = meta.buckets match {
      case Some(n) =>
        val bucketExpr =
          coalesce(pmod(col(keyName), lit(n.toLong)), lit(0L))
        src.repartition(n, bucketExpr)
          .sortWithinPartitions(col(keyName))
      case None =>
        src.repartition(1).sortWithinPartitions(col(keyName))
    }
    try {
      shaped.write
        .format("graft.sources.KvJsonlSink")
        .option("layout_rewrite", "true")
        .option("maintenance", "true")
        .option("maintenance_base", head.toString)
        .mode("overwrite")
        .save(path)
      compactions.incrementAndGet()
      ()
    } catch {
      // base pin lost to a concurrent commit: the policy re-fires on
      // that commit's own trigger — skipping is the correct move (the
      // user's write already committed; only the advisory rewrite
      // yields)
      case _: KvSnapshots.CommitConflictException =>
        skippedOnConflict.incrementAndGet()
        ()
    }
  }
}
