package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused diagnostic for the round-14 sweep-drift bisect.
  *
  * The instrumented sweep showed every worst regressor is a `t*` query
  * (tpch_q14-18, theilsen_trend, token_*, text_quality, title_fuzzy,
  * t_closeness ... 2.8-5.8x vs the r13 clean sweep) — the alphabet block
  * that runs IMMEDIATELY after the ~30 `stream_*` gates — while the same
  * queries are flat in isolation. This main measures the aftermath
  * directly:
  *
  *   phase A: time the t* regressors in a fresh session   (baseline)
  *   phase B: run all stream_* gates                      (the suspect)
  *   phase C: time the t* regressors again                (the damage)
  *   phase D: StateStore.unloadAll() + System.gc(), retime (the remedy)
  *
  * If C >> A and D ~= A, the cause is state the streaming gates leave
  * behind (loaded state-store providers + collectable garbage) and the
  * remedy belongs in Bench's sweep loop after streaming queries.
  */
object StreamAftermathDiag {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val regressors = Seq(
      "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18",
      "theilsen_trend", "token_count_bpe", "text_quality", "t_closeness",
      "target_encoding", "title_fuzzy", "token_chi2")
    val streams =
      graft.SparkEntry.queries.keys.filter(_.startsWith("stream_")).toSeq.sorted

    def timeBlock(tag: String, names: Seq[String]): Double = {
      val t0 = System.nanoTime()
      names.foreach { n =>
        val q0 = System.nanoTime()
        try graft.SparkEntry.queries(n)(spark, sfDir).count()
        catch {
          case scala.util.control.NonFatal(e) =>
            println(s"DIAG FAIL $n ${e.getClass.getSimpleName}")
        }
        println(f"DIAG $tag%s $n%s ${(System.nanoTime() - q0) / 1e9}%.3fs")
      }
      val total = (System.nanoTime() - t0) / 1e9
      println(f"DIAG BLOCK $tag%s total=${total}%.1fs")
      total
    }

    // warmup so phase A is not measuring session cold-start
    Seq("flagship", "join_broadcast").foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir.replace("sf0.1", "sf0.001"))
        .count()
    }
    timeBlock("warm", regressors)       // JIT/scan warm pass
    val a = timeBlock("A_fresh", regressors)
    timeBlock("B_streams", streams)
    val c1 = timeBlock("C_after_streams", regressors)
    // StateStore.unloadAll() is private[sql]; this is a diagnostic-only
    // tool, so reach it reflectively rather than open a package alias.
    val ssCls = Class.forName(
      "org.apache.spark.sql.execution.streaming.state.StateStore$")
    val ssMod = ssCls.getField("MODULE$").get(null)
    ssCls.getMethod("unloadAll").invoke(ssMod)
    System.gc()
    Thread.sleep(500)
    val d = timeBlock("D_after_remedy", regressors)
    val c2 = timeBlock("E_steady", regressors)
    println(f"DIAG SUMMARY A=$a%.1f C=$c1%.1f D=$d%.1f E=$c2%.1f " +
      f"C/A=${c1 / a}%.2f D/A=${d / a}%.2f")
    spark.stop()
  }
}
