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

  /** Canonical scratch-sink path for gate queries that exercise a
    * write+read-back round trip. The gate runs queries serially, so
    * one shared namespace is safe; a concurrent deployment would
    * suffix a run id.
    */
  def sinkDir(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/$name"
}
