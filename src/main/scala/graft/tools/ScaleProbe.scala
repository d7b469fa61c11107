package graft.tools

import org.apache.spark.sql.SparkSession

/** The sf1.0 scaling probe (round-14 verdict item 7): the first
  * EMPIRICAL point on the 100x scaling curve the plan audits argue
  * from. Runs the registry's heaviest queries at sf0.1 and at the
  * ScaleGen-produced 10x directory in ONE JVM (same JIT/session
  * state, so the ratio isolates data volume), best-of-2 each, and
  * writes BENCH_SF1_PROBE.json with per-query times and the
  * time(10x)/time(1x) ratio. A plan that scales linearly in work and
  * keeps its parallelism shows a ratio well under 10 on 32 cores
  * (sf0.1 underfills the box); a super-linear ratio (>> 10) is a
  * scale-killer caught before it ships.
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_SF1_DIR (default /root/repo/tmp_scale/sf1.0).
  */
object ScaleProbe {

  val Heavies: Seq[String] = Seq(
    "dedup_policy", "lsh_param_sweep", "setsim_prefix_join",
    "pq_report", "token_pmi", "theilsen_trend", "repetition_score",
    "minhash_band_pairs", "top_terms_per_source", "tpch_q18",
    "stream_heavy_hitters", "stream_v2_metadata")

  def main(args: Array[String]): Unit = {
    val sf01 =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sf1 =
      sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/root/repo/tmp_scale/sf1.0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    require(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(sf1, "documents.parquet")),
      s"no scaled data at $sf1 — run graft.tools.ScaleGen first")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String, dir: String): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min

    // JIT warm pass at the small scale, then measure both scales
    Heavies.foreach { n =>
      try graft.SparkEntry.queries(n)(
        spark, sf01.replace("sf0.1", "sf0.01")).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val rows = Heavies.map { n =>
      val t01 = time(n, sf01)
      val t1 = time(n, sf1)
      println(f"[scaleprobe] $n%-24s sf0.1=${t01}%7.2fs " +
        f"sf1.0=${t1}%7.2fs ratio=${t1 / t01}%5.2f")
      (n, t01, t1)
    }
    def f2(d: Double): String = f"$d%.3f"
    val json = rows.map { case (n, a, b) =>
      s""""$n":{"sf0_1_s":${f2(a)},"sf1_0_s":${f2(b)},""" +
        s""""ratio":${f2(b / a)}}"""
    }.mkString(",")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_SF1_PROBE.json"),
      (s"""{"unit":"sec","sf_small":"$sf01","sf_big":"$sf1",""" +
        s""""scale_factor":10,"best_of":2,"queries":{$json}}""" +
        "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
