package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main for adjudicating isolated-bench anomalies: times
  * each named query with PER-ATTEMPT resolution (never just the min)
  * in a fresh session after the standard Bench warmup, so
  * shared-state rebuild costs (memoized pinned frames, state-store
  * warmup) show up as an attempt-1 spike instead of vanishing into a
  * best-of aggregate. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_PROBE=q1,q2 runMain graft.tools.IsoProbe
  */
object IsoProbe {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "SPARK_GRAFT_PROBE names no queries")
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
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name attempts=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
