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
    */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverseIterator.foreach(Files.delete)
      } finally walk.close()
    }

  def deleteRecursively(path: String): Unit =
    deleteRecursively(Paths.get(path))

  /** Per-process namespace token: two JVMs on one host (e.g. `sbt
    * test` overlapping a gate Verify run on a CI box) must never
    * share a scratch sink or a warehouse table name, or they corrupt
    * each other's write+read-back round trips mid-flight.
    */
  val runId: String = java.util.UUID.randomUUID().toString.take(8)

  /** Canonical scratch-sink path for gate queries that exercise a
    * write+read-back round trip — run-id suffixed (see [[runId]]);
    * stable within one JVM so repeated in-process runs overwrite
    * rather than accumulate.
    */
  def sinkDir(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/$name-$runId"

  /** Run-id-suffixed catalog table name, same isolation argument as
    * [[sinkDir]] for tables in the shared warehouse dir.
    */
  def runTable(name: String): String = s"${name}_$runId"
}
