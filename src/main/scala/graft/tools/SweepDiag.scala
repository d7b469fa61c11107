package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main for the SWEEP-AGING question (round-14 item 1):
  * does the shared bench session degrade as it executes the registry?
  * Runs the full registry once in Bench's exact session shape,
  * sampling every N queries:
  *
  *   - elapsed time of the sample block (the aging signal itself),
  *   - persistent-RDD count and their total memory footprint (the
  *     leaked-localCheckpoint hypothesis: pinned blocks whose frames
  *     went unreachable but whose storage survives until a GC lets
  *     the ContextCleaner's weak references fire — default
  *     spark.cleaner.periodicGC.interval is 30 MINUTES, longer than
  *     the whole sweep),
  *   - a fixed cheap probe query (flagship at sf0.001) as an
  *     absolute session-health measure.
  *
  * SPARK_GRAFT_DIAG_GC=1 adds a System.gc() per sample block, which
  * separates the hypotheses: if aging vanishes under forced GC, the
  * cause is collectable garbage (blocks or heap), not accumulated
  * live state.
  */
object SweepDiag {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val every = sys.env.getOrElse("SPARK_GRAFT_DIAG_EVERY", "40").toInt
    val forceGc = sys.env.get("SPARK_GRAFT_DIAG_GC").contains("1")
    // Bench executes every query twice (min-of-2); reproducing its
    // code-cache/JIT load needs the same run multiplicity.
    val runs = sys.env.getOrElse("SPARK_GRAFT_DIAG_RUNS", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("flagship", "join_broadcast", "window_rownum", "vector_norms")
      .foreach { name =>
        graft.SparkEntry.queries.get(name).foreach { fn =>
          try fn(spark, sfDir.replace("sf0.1", "sf0.001")).count()
          catch { case _: Throwable => () }
        }
      }

    def probe(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("flagship")(
        spark, sfDir.replace("sf0.1", "sf0.001")).count()
      (System.nanoTime() - t0) / 1e9
    }

    def sample(tag: String, blockSec: Double): Unit = {
      val rdds = spark.sparkContext.getPersistentRDDs
      val storage = spark.sparkContext.getRDDStorageInfo
      val memMb = storage.map(_.memSize).sum / 1e6
      val heapMb = (Runtime.getRuntime.totalMemory() -
        Runtime.getRuntime.freeMemory()) / 1e6
      // JIT code cache + metaspace occupancy: 431 codegen'd queries
      // compile thousands of generated classes; if the code cache
      // fills, flushing evicts HOT methods and whole blocks run
      // part-interpreted until recompilation catches up — the
      // "one slow block that recovers" signature.
      import scala.jdk.CollectionConverters._
      val pools = java.lang.management.ManagementFactory
        .getMemoryPoolMXBeans.asScala
      def poolMb(fragment: String): Double = pools
        .filter(_.getName.contains(fragment))
        .map(_.getUsage.getUsed).sum / 1e6
      println(f"DIAG $tag%s block=${blockSec}%.1fs " +
        f"rdds=${rdds.size}%d storageMB=$memMb%.0f " +
        f"heapMB=$heapMb%.0f codeMB=${poolMb("CodeHeap")}%.0f " +
        f"metaMB=${poolMb("Metaspace")}%.0f probe=${probe()}%.2fs")
    }

    sample("start", 0.0)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    names.grouped(every).zipWithIndex.foreach { case (chunk, i) =>
      val t0 = System.nanoTime()
      chunk.foreach { name =>
        (1 to runs).foreach { _ =>
          try graft.SparkEntry.queries(name)(spark, sfDir).count()
          catch {
            case scala.util.control.NonFatal(e) =>
              println(s"DIAG FAIL $name ${e.getClass.getSimpleName}")
          }
        }
      }
      if (forceGc) System.gc()
      sample(s"after[${(i + 1) * every}]", (System.nanoTime() - t0) / 1e9)
    }
    spark.stop()
  }
}
