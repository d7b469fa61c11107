package graft

import java.nio.file.{Files, Path, Paths}

/** Tiny filesystem helpers shared by the sink queries, the streaming
  * checkpoint setup, and the specs — one implementation so fixes
  * (stream closing, null-listing, symlink handling) happen once.
  */
object Fs {

  /** Delete `p` and everything under it; no-op when absent. The
    * `Files.walk` stream is closed explicitly — it holds directory
    * handles, and the gate/bench JVMs are long-lived.
    *
    * Race-tolerant by construction: this runs from shutdown hooks
    * (e.g. the reliable-checkpoint cleanup) CONCURRENTLY with Spark's
    * own ShutdownHookManager deleting the same tree, so any entry can
    * vanish between the walk snapshot and its delete — that is a
    * success (the file is gone), not an error. `deleteIfExists` plus
    * swallowing `NoSuchFileException` covers per-file vanishing; a
    * `DirectoryNotEmptyException` (a child appeared after our
    * snapshot, or a racer re-created one) gets one fresh re-walk
    * before giving up quietly — scratch trees under tmpdir are
    * best-effort, and an exception stack from a shutdown hook is
    * noise that masks real failures in log tails.
    */
  def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    def snapshot(): Seq[Path] =
      if (!Files.exists(p)) Nil
      else {
        val walk =
          try Files.walk(p)
          catch { case _: java.io.IOException => return Nil }
        try walk.iterator().asScala.toSeq
        catch {
          // The stream stats entries lazily; a concurrently-vanishing
          // one surfaces mid-iteration as UncheckedIOException.
          case _: java.io.UncheckedIOException => Nil
        } finally walk.close()
      }
    var attempts = 2
    var retry = true
    while (retry && attempts > 0) {
      attempts -= 1
      retry = false
      snapshot().reverseIterator.foreach { f =>
        try { Files.deleteIfExists(f); () }
        catch {
          case _: java.nio.file.NoSuchFileException => ()
          case _: java.nio.file.DirectoryNotEmptyException => retry = true
        }
      }
    }
  }

  def deleteRecursively(path: String): Unit =
    deleteRecursively(Paths.get(path))

  /** Strict variant for DDL paths (DROP TABLE / DROP NAMESPACE, the
    * snapshot-collapse manifest cleanup): same race-tolerant walk,
    * but VERIFIES the tree is gone and throws when it survives both
    * attempts. The best-effort swallow is right for shutdown-hook
    * scratch cleanup and wrong for DDL — DROP TABLE must not report
    * success while the directory still exists (a later CREATE TABLE
    * would throw TableAlreadyExists), and a surviving `_snapshots`
    * dir after the meta flip would corrupt version numbering if
    * snapshots are re-enabled.
    */
  def deleteRecursivelyVerified(p: Path): Unit = {
    deleteRecursively(p)
    if (Files.exists(p))
      throw new java.io.IOException(
        s"failed to delete $p — the directory survived two delete " +
          "passes (concurrent writer?)")
  }

  def deleteRecursivelyVerified(path: String): Unit =
    deleteRecursivelyVerified(Paths.get(path))

  /** Per-process namespace token: two JVMs on one host (e.g. `sbt
    * test` overlapping a gate Verify run on a CI box) must never
    * share a scratch sink or a warehouse table name, or they corrupt
    * each other's write+read-back round trips mid-flight.
    */
  val runId: String = java.util.UUID.randomUUID().toString.take(8)

  /** Run-id namespaces isolate concurrent JVMs but orphan every PRIOR
    * run's scratch (a crashed run never cleans up, and its dirs carry
    * a different runId than any cleanup that keys on current names).
    * So each namespace helper also REAPS stale siblings: same base
    * name, different run id, untouched longer than this horizon —
    * far beyond any live gate/bench/test run, so a concurrent run's
    * fresh scratch is never collected.
    */
  private val StaleMillis = 6L * 3600 * 1000

  private def reapStaleSiblings(parent: Path, base: String): Unit = {
    val cutoff = System.currentTimeMillis() - StaleMillis
    val ls = try Files.list(parent) catch { case _: Exception => return }
    try {
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          (n.startsWith(base + "-") || n.startsWith(base + "_")) &&
            !n.endsWith(runId) &&
            (try Files.getLastModifiedTime(p).toMillis < cutoff
             catch { case _: Exception => false })
        }
        .toSeq
        .foreach(p =>
          try deleteRecursively(p) catch { case _: Exception => () })
    } finally ls.close()
  }

  /** Canonical scratch-sink path for gate queries that exercise a
    * write+read-back round trip — run-id suffixed (see [[runId]]);
    * stable within one JVM so repeated in-process runs overwrite
    * rather than accumulate, with stale prior-run siblings reaped.
    */
  def sinkDir(name: String): String = {
    reapStaleSiblings(
      Paths.get(System.getProperty("java.io.tmpdir")), name)
    s"${System.getProperty("java.io.tmpdir")}/$name-$runId"
  }

  /** Run-id-suffixed catalog table name, same isolation argument as
    * [[sinkDir]] for tables in the shared warehouse dir.
    */
  def runTable(name: String): String = s"${name}_$runId"

  /** Drop a managed table AND its warehouse location — an aborted
    * earlier in-process run can orphan the location, which
    * overwrite-CREATE then refuses. Also reaps stale prior-run
    * namesakes (this JVM's metastore never knew their names, but
    * their directories persist). One implementation for every
    * saveAsTable round-trip site.
    */
  def dropTableAndLocation(
      spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = Paths.get(java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath)
    deleteRecursively(wh.resolve(table))
    val base = table.stripSuffix("_" + runId)
    if (base != table) reapStaleSiblings(wh, base)
  }
}
