package graft.tools

import org.apache.spark.sql.SparkSession

/** Three-point scaling curve for the queries the sf1.0 probe flagged
  * as super-linear (round-14 verdict item 8): one scale step cannot
  * distinguish log-linear growth from quadratic onset — 2.8× time for
  * 10× data is excellent if the curve is flattening and alarming if
  * it is steepening. This probe times each query at 1×, 3× and 10×
  * replicas (same JVM, best-of-3, warm passes first)
  * and fits the local log-log slope between consecutive points:
  *
  *   alpha = ln(t_b / t_a) / ln(b / a)
  *
  * alpha < 1 means sub-linear in data (fixed costs still amortizing
  * or parallel slack absorbing the growth), ~1 linear, > 1.2
  * super-linear. The SHAPE verdict compares the two slopes: a
  * steepening curve (alpha_3_10 − alpha_1_3 > 0.25) is flagged
  * `steepening` — the quadratic-onset signature — while flat or
  * falling slopes are `stable` / `flattening`.
  *
  * Env: SPARK_GRAFT_SF_DIR   (1× dir, default /root/testdata/sf0.1)
  *      SPARK_GRAFT_SF3_DIR  (3× dir, default /root/repo/tmp_scale/sf0.3)
  *      SPARK_GRAFT_SF1_DIR  (10× dir, default /root/repo/tmp_scale/sf1.0)
  * Both scaled dirs come from graft.tools.ScaleGen (SPARK_GRAFT_SCALE
  * = 3 / 10).
  */
object ScaleCurve {

  /** The round-14 super-linear trio first (the open question), then
    * the rest of the sf1.0 probe's heavy set — a shape verdict for
    * every query whose 10x ratio the probe measured. pq_report acts
    * as the control (a probe that flags it too is measuring the box,
    * not the plans).
    */
  val Targets: Seq[String] = Seq(
    "setsim_prefix_join", "lsh_param_sweep", "tpch_q18", "pq_report",
    "dedup_policy", "token_pmi", "theilsen_trend", "repetition_score",
    "minhash_band_pairs", "top_terms_per_source",
    "stream_heavy_hitters", "stream_v2_metadata",
    // round-17: the newest pruning structures carry the same
    // measured-slope evidence as the text/similarity heavies — the
    // runtime-bloom-filtered join and the selective CoW DML rewrite
    // (each gate rebuilds its kv table from the scaled fixture, so
    // the curve covers ingest + the pruned path end-to-end).
    "catalog_runtime_bloom", "catalog_dml_selective",
    // round-18: the named-key SPJ (ingest + zero-exchange zero-sort
    // join), the streaming-ingest auto-compaction lifecycle, the
    // token-array store + explode aggregate, and the pinned-ANN
    // build→stale→refresh→serve lifecycle — every new path gets a
    // measured slope, not an assumed one.
    "catalog_spj_named", "catalog_auto_compact",
    "catalog_array_string", "catalog_ann_pinned",
    // round-18 string keys: the hash-bucketed SPJ (ingest + join on
    // STRING keys) and the dimension-driven runtime pruning of a
    // string-keyed fact — the two scale claims the string-key work
    // makes, measured like their BIGINT twins.
    "catalog_spj_string", "catalog_string_runtime",
    // round-18 composed layout: ingest through the (unit × bucket)
    // fan-out writer + the month-pruned zero-exchange join — the
    // composed claims measured end-to-end.
    "catalog_composed_layout")

  /** Optional FOURTH point (round-16): the two heavies whose 3→10
    * slope sat at the linear boundary (setsim_prefix_join 0.93,
    * repetition_score 0.94) get a 30× measurement when the replica
    * dir exists — one more tripling decides whether "linear" was the
    * truth or the early face of super-linear growth the 10× window
    * couldn't see. Round-18 adds `stream_v2_metadata`: the one
    * labeled-steepening entry in the committed curve (α₁→₃ 0.33 →
    * α₃→₁₀ 0.86) — the 30× point decides whether the slope keeps
    * climbing past 1 (a super-linear batch-machinery component) or
    * was fixed costs amortizing toward linear IO.
    */
  val Targets30: Set[String] =
    Set("setsim_prefix_join", "repetition_score", "stream_v2_metadata",
      // round-18: the named-key SPJ's 3→10 slope (0.92) sits at the
      // linear boundary with rising slopes (fixed ingest costs
      // amortizing) — the 30× point decides the shape like it did
      // for stream_v2_metadata.
      "catalog_spj_named")

  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_CURVE_ONLY=a,b — measure a subset and MERGE into the
    // existing BENCH_SCALE_CURVE.json (entries not re-measured are
    // kept verbatim), so adding one query's curve never discards the
    // committed evidence for the rest.
    val only: Set[String] = sys.env.get("SPARK_GRAFT_CURVE_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val targets =
      if (only.isEmpty) Targets else Targets.filter(only.contains)
    val sf1x =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sf3x =
      sys.env.getOrElse("SPARK_GRAFT_SF3_DIR", "/root/repo/tmp_scale/sf0.3")
    val sf10x =
      sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/root/repo/tmp_scale/sf1.0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    Seq(sf3x -> 3, sf10x -> 10).foreach { case (d, k) =>
      require(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(d, "documents.parquet")),
        s"no ${k}x data at $d — run graft.tools.ScaleGen with " +
          s"SPARK_GRAFT_SCALE=$k SPARK_GRAFT_OUT_DIR=$d first")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Best-of-3: contention on this shared box only ever ADDS time,
    // and the three points of one query span ~30s of wall — enough
    // for a co-tenant burst to poison a single-shot slope. The min of
    // three samples per point is the defensible steady-state.
    def time(name: String, dir: String): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min

    // Warm twice: once at sf0.01 (codegen/JIT) and once UNTIMED at the
    // 1x scale itself — the first 3-point run showed the first timed
    // point absorbing residual warmup (t_3x < t_1x for the first
    // target), which corrupts the fitted slope signs.
    targets.foreach { n =>
      try graft.SparkEntry.queries(n)(
        spark, sf1x.replace("sf0.1", "sf0.01")).count()
      catch { case scala.util.control.NonFatal(_) => () }
      try graft.SparkEntry.queries(n)(spark, sf1x).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    def f3(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val sf30x = sys.env.getOrElse(
      "SPARK_GRAFT_SF30_DIR", "/root/repo/tmp_scale/sf3.0")
    val have30 = java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(sf30x, "documents.parquet"))
    if (!have30)
      System.err.println(
        s"[scalecurve] no 30x data at $sf30x — the 4th point is " +
          "skipped (run ScaleGen with SPARK_GRAFT_SCALE=30 to add it)")
    val rows = targets.map { n =>
      val t1 = time(n, sf1x)
      val t3 = time(n, sf3x)
      val t10 = time(n, sf10x)
      val a13 = math.log(t3 / t1) / math.log(3.0)
      val a310 = math.log(t10 / t3) / math.log(10.0 / 3.0)
      // 10→30 slope for the boundary-linear heavies (see Targets30).
      val p30: Option[(Double, Double)] =
        if (have30 && Targets30(n)) {
          val t30 = time(n, sf30x)
          Some((t30, math.log(t30 / t10) / math.log(3.0)))
        } else None
      // A NEGATIVE 1→3 slope (more data, less time) cannot be work
      // growth — it is the base layout: the driver's sf0.1 tables are
      // single parquet files while the ScaleGen replicas are multi-
      // file, so the 1× point under-parallelizes its scan stage. The
      // shape verdict then rests on the 3→10 slope alone (both points
      // share the replica layout) and says so.
      val layoutArtifact = a13 < 0
      // The shape verdict uses the FARTHEST measured slope: with a
      // 30x point the question "does the slope hold past 10x?" is
      // answered by alpha(10→30) against alpha(3→10).
      val lastA = p30.map(_._2).getOrElse(a310)
      val prevA = if (p30.isDefined) a310 else a13
      val shape =
        if (layoutArtifact && p30.isEmpty)
          "3-10-only (1x base under-parallelized)"
        else if (lastA - prevA > 0.25) "steepening"
        else if (prevA - lastA > 0.25) "flattening"
        else "stable"
      val regime =
        if (lastA < 0.9) "sub-linear"
        else if (lastA <= 1.2) "linear"
        else "super-linear"
      println(f"[scalecurve] $n%-22s t1=${t1}%6.2fs t3=${t3}%6.2fs " +
        f"t10=${t10}%6.2fs alpha(1→3)=${a13}%5.2f " +
        f"alpha(3→10)=${a310}%5.2f" +
        p30.fold("")(p =>
          f" t30=${p._1}%6.2fs alpha(10→30)=${p._2}%5.2f") +
        f" $regime/$shape")
      s""""$n":{"t_1x_s":${f3(t1)},"t_3x_s":${f3(t3)},""" +
        s""""t_10x_s":${f3(t10)},"alpha_1_3":${f3(a13)},""" +
        s""""alpha_3_10":${f3(a310)},""" +
        p30.fold("")(p =>
          s""""t_30x_s":${f3(p._1)},"alpha_10_30":${f3(p._2)},""") +
        s""""regime":"$regime","shape":"$shape"}"""
    }
    // subset runs merge into the committed curve: keep every existing
    // entry this run did not re-measure (the file is only ever written
    // here, so the one-level-deep entry regex is exact)
    val kept: Seq[String] =
      if (only.isEmpty) Seq.empty
      else {
        val f = java.nio.file.Paths.get("BENCH_SCALE_CURVE.json")
        if (!java.nio.file.Files.isRegularFile(f)) Seq.empty
        else {
          val txt = new String(java.nio.file.Files.readAllBytes(f),
            java.nio.charset.StandardCharsets.UTF_8)
          val entryRe = """"([A-Za-z0-9_]+)":\{[^{}]*\}""".r
          val qStart = txt.indexOf("\"queries\":{")
          if (qStart < 0) Seq.empty
          else entryRe.findAllMatchIn(txt.substring(qStart + 11))
            .filter(m => !targets.contains(m.group(1)))
            .map(_.matched).toSeq
        }
      }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_SCALE_CURVE.json"),
      (s"""{"unit":"sec","points":[1,3,10${if (have30) ",30" else ""}],""" +
        s""""base":"$sf1x","best_of":3,""" +
        s""""queries":{${(kept ++ rows).mkString(",")}}}""" +
        "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
