package graft.tools

import org.apache.spark.sql.SparkSession

/** Measured evidence for the write.auto_compact policy (round 18) —
  * the two questions a 100 TB operator has before leaving a standing
  * policy on a streaming table:
  *
  *   1. what does it COST at ingest? Policy compactions run
  *      synchronously after the triggering commit, so trickle-ingest
  *      wall clock absorbs them. The probe ingests the same rows as
  *      N small commits with and without the policy and reports both
  *      walls, plus the policy's WRITE AMPLIFICATION (rows rewritten
  *      by compactions / rows ingested — the spare-the-largest victim
  *      rule makes it LSM-like, each row re-merged O(log commits)
  *      times, never the O(commits/threshold) a merge-everything
  *      policy pays);
  *   2. what does it BUY at read? The unbounded table reads
  *      N files per bucket (open/parse overhead per file and
  *      per-bucket merge fan-in); the policied table reads ≤
  *      threshold. The probe times the same full aggregate on both.
  *
  * Emits one JSON line to stdout and appends it to
  * AUTOCOMPACT_PROBE.json; SCALE.md records the verdict.
  *
  * Run: sbt "runMain graft.tools.AutoCompactProbe"
  */
object AutoCompactProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.catalog.graft_kv",
      classOf[graft.sources.KvCatalog].getName)
    val wh = java.nio.file.Files
      .createTempDirectory("graft_ac_probe").toString
    spark.conf.set("spark.sql.catalog.graft_kv.warehouse", wh)

    val rows = sys.env.getOrElse("SPARK_GRAFT_AC_ROWS", "1200000").toLong
    val commits = sys.env.getOrElse("SPARK_GRAFT_AC_COMMITS", "24").toInt
    val threshold = sys.env.getOrElse("SPARK_GRAFT_AC_T", "4").toInt
    val per = rows / commits

    def ingest(table: String, props: String): Double = {
      spark.sql(s"DROP TABLE IF EXISTS graft_kv.default.$table")
      spark.sql(s"CREATE TABLE graft_kv.default.$table " +
        "(key BIGINT, value STRING) PARTITIONED BY (bucket(8, key)) " +
        s"TBLPROPERTIES ('snapshots'='true'$props)")
      val t0 = System.nanoTime()
      for (c <- 0 until commits)
        spark.sql(s"INSERT INTO graft_kv.default.$table " +
          s"SELECT id, concat('v', id) " +
          s"FROM range(${c * per}, ${(c + 1) * per})")
      (System.nanoTime() - t0) / 1e9
    }

    def filesOf(table: String): Int = {
      val d = s"$wh/default/$table"
      graft.sources.KvSnapshots.dataFiles(
        graft.sources.KvSnapshots.membersWithStats(d,
          graft.sources.KvSnapshots.latest(d).get)).size
    }

    def scanTime(table: String): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.sql("SELECT count(*) AS n, sum(length(value)) AS s " +
          s"FROM graft_kv.default.$table WHERE key >= 0")
          .collect()
        (System.nanoTime() - t0) / 1e9
      }.min

    // warm the whole path once, untimed (codegen, catalog, committer)
    ingest("ac_warm", "")

    val ingestNone = ingest("ac_none", "")
    val rw0 = graft.sources.KvAutoCompact.rewrittenRows.get()
    val fired0 = graft.sources.KvAutoCompact.compactions.get()
    val ingestPolicy =
      ingest("ac_policy", s", 'write.auto_compact'='$threshold'")
    val fired = graft.sources.KvAutoCompact.compactions.get() - fired0
    val rewritten =
      graft.sources.KvAutoCompact.rewrittenRows.get() - rw0
    val filesNone = filesOf("ac_none")
    val filesPolicy = filesOf("ac_policy")
    val scanNone = scanTime("ac_none")
    val scanPolicy = scanTime("ac_policy")
    require(filesPolicy <= 8 * threshold,
      s"policy did not hold the bound: $filesPolicy files")
    require(filesNone == 8 * commits,
      s"unexpected unbounded layout: $filesNone files")

    def f3(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val json =
      s"""{"rows":$rows,"commits":$commits,"threshold":$threshold,
         |"none":{"ingest_s":${f3(ingestNone)},"files":$filesNone,
         |"scan_s":${f3(scanNone)}},
         |"policy":{"ingest_s":${f3(ingestPolicy)},
         |"files":$filesPolicy,"scan_s":${f3(scanPolicy)},
         |"compactions":$fired,"rewritten_rows":$rewritten,
         |"write_amplification":${f3(
          rewritten.toDouble / rows + 1.0)}}}"""
        .stripMargin.replace("\n", "")
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("AUTOCOMPACT_PROBE.json"),
      (json + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    spark.stop()
  }
}
