package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
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
    new java.io.File(outDir).mkdirs()
    // Builder-side iteration aid: SPARK_GRAFT_ONLY=a,b,c restricts the
    // dump (and the oracle json) to the named queries. The driver never
    // sets it, so the gate always runs the full registry. Guards: an
    // empty or unknown-name value fails loudly (a leaked env var must
    // never shrink the gate to a silently-green subset), and subset
    // mode announces itself on stderr.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      require(names.nonEmpty,
        "SPARK_GRAFT_ONLY is set but names no queries — unset it to " +
          "run the full registry")
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unregistered queries: " +
          s"${unknown.mkString(", ")}")
      System.err.println(
        s"[verify] SUBSET MODE: ${names.size} of " +
          s"${SparkEntry.queries.size} queries (SPARK_GRAFT_ONLY)")
    }
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    // Crash sentinel: a throwing query must surface as a LOUD red row,
    // never as silent registry shrinkage — round 8's two crashed
    // queries simply vanished from CORRECTNESS (no output dir, no err),
    // which reads as "not registered". Every failure is recorded in
    // $outDir/_errors.json (always written, {} when clean) so the
    // driver and tools/check.py can grade a crash as a failure with a
    // message instead of a missing entry.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) =
          s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter(kv => only.forall(_(kv._1)))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // Subset runs write a SIDECAR manifest and remove the other form:
    // a subset must never masquerade as (or coexist with a stale copy
    // of) the full-registry manifest, or a later tools/check.py run
    // would report an all-green small-N result that reads like a full
    // pass. Full runs symmetrically clear any stale subset sidecar.
    val oracleFile =
      if (only.isDefined) "oracle_sql.subset.json" else "oracle_sql.json"
    val staleFile =
      if (only.isDefined) "oracle_sql.json" else "oracle_sql.subset.json"
    Files.deleteIfExists(Paths.get(s"$outDir/$staleFile"))
    Files.writeString(Paths.get(s"$outDir/$oracleFile"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    spark.stop()
  }
}
