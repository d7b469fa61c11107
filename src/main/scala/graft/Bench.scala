package graft

import org.apache.spark.sql.SparkSession

/** Bench harness: times every registered query at the given scale
  * factor and prints ONE JSON line. A warmup pass over a few
  * representative plans runs first, untimed — the first aggregate
  * query in a fresh JVM otherwise pays ~15-30 s of Janino/JIT
  * bootstrap that has nothing to do with the plan being measured
  * (verified: 28 s first run → 1.5 s second run of the same query).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: one tiny aggregate/join/window/HOF plan each, to compile
    // the codegen + JIT paths shared by the timed queries below.
    Seq("flagship", "join_broadcast", "window_rownum", "vector_norms")
      .foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          try fn(spark, sfDir.replace("sf0.1", "sf0.001")).count()
          catch { case _: Throwable => () }
        }
      }

    // Best-of-2 per query: single-shot numbers on a shared box swing
    // ~5× from scheduling noise (a different query spikes every run);
    // the min of two executions is a stable steady-state measure.
    // A query that throws is recorded as a FAILURE (name + error),
    // excluded from the total, and fails the bench loudly — a broken
    // query must never silently improve the number.
    // Builder-side iteration aid, mirroring Verify's guards:
    // SPARK_GRAFT_ONLY restricts the timed set; empty or unknown names
    // fail loudly (a leaked env var must never shrink the bench to a
    // silently-green subset). The driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      require(names.nonEmpty,
        "SPARK_GRAFT_ONLY is set but names no queries — unset it to " +
          "bench the full registry")
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unregistered queries: " +
          s"${unknown.mkString(", ")}")
      System.err.println(s"[bench] SUBSET MODE: ${names.size} queries")
    }
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = selected.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val times = (1 to 2).flatMap { _ =>
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            Some((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable =>
              failures(name) =
                s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
              None
          }
        }
        if (times.nonEmpty) Some(name -> times.min) else None
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val nFail = failures.size
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_queries":${results.size},"n_failed":$nFail,"sf":"$sfDir"}""")
    // Second, short line: the full per-query map above can exceed the
    // driver's tail capture; this one always parses.
    val shortLine =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":$nFail,"sf":"$sfDir"}"""
    println(shortLine)
    // Belt-and-braces for log-capture parsers: the totals also land in
    // a file (sbt logging prefixes defeated stdout parsing in earlier
    // rounds even with the short line). Subset runs write to .subset-
    // suffixed sidecars — a partial sweep must never masquerade as the
    // full-run perf history (same rule as Verify's oracle manifest).
    val suffix = if (only.isDefined) ".subset" else ""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"BENCH_TOTAL$suffix.json"),
      (shortLine + "\n").getBytes("UTF-8"))
    // Per-query timings as their own artifact: the stdout line above
    // truncates in the driver's tail capture once the registry is
    // large, leaving most queries with no cross-round perf history.
    // This file is the full map, always auditable.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"BENCH_PERQ$suffix.json"),
      (s"""{"sf":"$sfDir","unit":"sec","queries":$qs}""" + "\n")
        .getBytes("UTF-8"))
    failures.foreach { case (name, err) =>
      System.err.println(s"BENCH FAILURE: $name — $err")
    }
    spark.stop()
    if (nFail > 0) sys.exit(1)
  }
}
