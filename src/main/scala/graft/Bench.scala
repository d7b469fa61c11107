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
  private def buildSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  // Warmup: one tiny aggregate/join/window/HOF plan each, to compile
  // the codegen + JIT paths shared by the timed queries below.
  private def warmup(spark: SparkSession, sfDir: String): Unit =
    Seq("flagship", "join_broadcast", "window_rownum", "vector_norms")
      .foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          try fn(spark, sfDir.replace("sf0.1", "sf0.001")).count()
          catch { case _: Throwable => () }
        }
      }

  /** Per-query times of the PREVIOUS full sweep (BENCH_PERQ.json as it
    * stands on disk before this run overwrites it). Used to flag
    * apparent regressions for the isolated re-run pass.
    */
  private def priorTimes(sfDir: String): Map[String, Double] =
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("BENCH_PERQ.json")), "UTF-8")
      // A prior sweep at a DIFFERENT scale factor is not a baseline:
      // comparing sf0.1 times against an sf0.01 file would flag most
      // of the registry as 2×-regressed.
      if (!txt.contains(s""""sf":"$sfDir"""")) Map.empty
      else {
        val qsIdx = txt.indexOf("\"queries\":")
        if (qsIdx < 0) Map.empty
        else
          """"([^"]+)":([0-9][0-9.Ee+-]*)""".r
            .findAllMatchIn(txt.substring(qsIdx + 10))
            // flatMap, not map: one malformed numeric must not discard
            // the whole baseline (the catch below would silently
            // disable regression flagging for the entire run).
            .flatMap(m =>
              m.group(2).toDoubleOption.map(m.group(1) -> _)).toMap
      }
    } catch {
      case e: Throwable =>
        System.err.println(
          s"[bench] WARNING: prior BENCH_PERQ.json unreadable " +
            s"(${e.getClass.getSimpleName}) — regression flagging " +
            "degrades to top10+watchlist this run")
        Map.empty
    }

  /** Per-query process-CPU seconds of the PREVIOUS sweep (BENCH_CPU
    * .json before this run overwrites it). The cross-round
    * adjudication signal: a wall regression with flat CPU is the box,
    * not the plan.
    */
  private def priorCpuTimes(sfDir: String): Map[String, Double] =
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("BENCH_CPU.json")), "UTF-8")
      if (!txt.contains(s""""sf":"$sfDir"""")) Map.empty
      else {
        val qsIdx = txt.indexOf("\"queries\":")
        if (qsIdx < 0) Map.empty
        else
          """"([^"]+)":([0-9][0-9.Ee+-]*)""".r
            .findAllMatchIn(txt.substring(qsIdx + 10))
            .flatMap(m =>
              m.group(2).toDoubleOption.map(m.group(1) -> _)).toMap
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val prior = priorTimes(sfDir)
    val priorCpu = priorCpuTimes(sfDir)
    var spark = buildSession(cpus)
    warmup(spark, sfDir)

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
    // Pre-sweep throwaway pass (round-16, closing the round-15 warmup
    // tail): the sf0.001 warmup above compiles the SHARED codegen/JIT
    // paths, but every quiet round-15 sweep still showed the first ~5
    // ALPHABETICAL entries at 2-3× their isolated floors — full-scale
    // machinery (shuffle service, parquet footer cache, broadcast
    // threads) warms over the first few sf0.1 queries regardless of
    // which they are. Run the first five of THIS sweep's order once,
    // untimed, so the a-block pays the tax here instead of in its
    // recorded numbers. Two passes over the first eight: the first
    // r16 run showed a single pass over five still left the first two
    // TIMED entries at ~2.2× their floors (the throwaway itself
    // absorbs the heavy warmup, but the first timed iteration still
    // paid a residual JIT/GC tax the second pass soaks up).
    (1 to 2).foreach { _ =>
      selected.toSeq.sortBy(_._1).take(8).foreach { case (_, fn) =>
        try { fn(spark, sfDir).count(); () }
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    // Process-CPU is sampled beside wall per run: the round-14 drift
    // bisect showed sweep regressions on untouched queries come from
    // CONCURRENT WORK on the box (whichever alphabet block runs during
    // a compile loses its cores), which a wall number alone cannot
    // distinguish from a real plan regression. cpu/wall adjudicates:
    // wall up with CPU flat = contention; wall and CPU up together =
    // the query really did more work. Written as the BENCH_CPU sidecar
    // so cross-round parsers of BENCH_PERQ's {name: sec} map survive.
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val resultsCpu = selected.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val times = (1 to 2).flatMap { _ =>
          val c0 = osBean.getProcessCpuTime
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            Some(((System.nanoTime() - t0) / 1e9,
              (osBean.getProcessCpuTime - c0) / 1e9))
          } catch {
            case e: Throwable =>
              failures(name) =
                s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
              None
          }
        }
        if (times.nonEmpty) Some(name -> times.minBy(_._1)) else None
    }
    val results = resultsCpu.map { case (k, (w, _)) => k -> w }
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
    // Contention sidecar: per-query process-CPU seconds of the chosen
    // (fastest) run. See the sampling comment above the sweep loop.
    val cpuQs = resultsCpu.map { case (k, (_, c)) =>
      // Locale-pinned (same rationale as the isolated pass's f4)
      s"\"" + k + "\":" +
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(c))
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"BENCH_CPU$suffix.json"),
      (s"""{"sf":"$sfDir","unit":"cpu-sec","queries":$cpuQs}""" + "\n")
        .getBytes("UTF-8"))
    failures.foreach { case (name, err) =>
      System.err.println(s"BENCH FAILURE: $name — $err")
    }

    // Isolated re-run pass (full sweeps only). Single-shot sweep times
    // on this shared box swing up to ~5× at identical code, so a sweep
    // number alone cannot support a cross-round regression claim. After
    // the sweep we rebuild the session (fresh executor state, no
    // accumulated cache/GC pressure), re-warm, and time EVERY query
    // that succeeded in the sweep — best-of-3 for the flagged set (50
    // slowest, >2×-prior regressions, historically-noisy watchlist),
    // best-of-2 for the rest — so an isolated floor exists for the
    // whole registry, not just the top-58 tail.
    //
    // ACCOUNTING, fixed in round 13: the fresh session has none of
    // the sweep's memoized pinned frames (near-dup signatures, ANN
    // index, gold eval frames, state-store warmup), so without
    // countermeasures the first attempts of shared-frame queries pay
    // full rebuilds and the committed floor is structurally wrong for
    // that class (round-12 driver rerun: l_diversity 14.6×, lang_id
    // 9.7×, kll_quantile_sketch 8.1× their sweep times from rebuild
    // accounting alone). So the isolated pass now runs a PREBUILD
    // sweep first — every query once, individually measured but not
    // floor-eligible — which restores every memoized frame and the
    // codegen/JIT state to the same warm footing the sweep enjoyed.
    // The timed attempts that follow measure steady-state plan cost;
    // the cold time is still published per entry as `cold_s`, with
    // `deps_rebuild_s` = max(0, cold_s - isolated) making the rebuild
    // charge explicit instead of smeared into the floor.
    // Filled by the isolated pass below; ride into the FINAL stdout
    // lines so the driver-captured bench artifact self-describes
    // sweep-side contention (round-15's 314.8 s of-record run was box
    // co-tenancy provable from fields already collected, but no flag
    // said so IN the artifact — a contended box read as a 1.24×
    // engine regression until hand-adjudicated).
    var nSweepContended = -1
    // Third disposition (round-17): the sweep blew past 2× the floor
    // WITH its CPU grown in step (>1.5× the floor's) — not the flat-CPU
    // co-tenancy signature, but a box whose cycles themselves degraded
    // (thermal/cgroup throttling, noisy-neighbor CPU steal). The
    // round-16 of-record run was exactly this: 51 entries 5-50× their
    // same-run floors, CPU grown 10-50× in lockstep, and the flat-CPU
    // flag correctly declined to call it co-tenancy — so the artifact
    // read "0 contended" on a run whose raw total was 2.05× its own
    // adjusted total. With both counts printed, every >2× entry carries
    // exactly one of {sweep_contended, cpu_inflated} and a degraded run
    // can never again self-describe as clean.
    var nCpuInflated = -1
    var adjustedTotal = total
    if (only.isEmpty) {
      val watchlist = Seq("tpch_q3", "tpch_q5", "tpch_q10", "bigram_topk",
        "date_trunc_events", "cosine_topk_lsh")
      val byTime = results.sortBy(-_._2)
      val top50 = byTime.take(50).map(_._1)
      val regressedAll = results.collect {
        case (n, t) if t > 0.3 && prior.get(n).exists(p => t > 2 * p) =>
          (n, t / prior(n))
      }
      // Bound the best-of-3 set to the 20 worst ratios — a noisy sweep
      // can 2×-flag half the registry. Dropped names still get the
      // best-of-2 registry pass, and are logged, never silently capped.
      val regressed = regressedAll.sortBy(-_._2).take(20).map(_._1)
      if (regressedAll.size > 20)
        System.err.println(
          s"[bench] best-of-3 set capped: ${regressedAll.size - 20} " +
            s"regressed queries beyond the 20 worst get best-of-2: " +
            regressedAll.sortBy(-_._2).drop(20).map(_._1).mkString(","))
      val flagged = (top50 ++ regressed ++ watchlist).distinct
        .filter(SparkEntry.queries.contains).toSet
      val all = results.map(_._1)
      System.err.println(
        s"[bench] isolated re-run: ${all.size} queries " +
          s"(best-of-3 for ${flagged.size}: top50=${top50.size}, " +
          s"regressed=${regressed.size}, watchlist=${watchlist.size})")
      // SESSION PROBE (round-14 floor-accounting item): one fixed
      // cheap query — the flagship at sf0.001 — timed at anchor
      // points in BOTH sessions. If the isolated session's probes
      // match the sweep session's, the two sessions are equivalent by
      // measurement and a >2× floor is attributable to the query's
      // own run (or box noise at that moment), not to fresh-session
      // warmup; a probe gap IS the measured session_warmup the driver
      // rerun previously had no way to adjudicate.
      def sessionProbe(): Double = {
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries("flagship")(
            spark, sfDir.replace("sf0.1", "sf0.001")).count()
          (System.nanoTime() - t0) / 1e9
        } catch { case scala.util.control.NonFatal(_) => -1.0 }
      }
      val probeSweepSession = sessionProbe()
      spark.stop()
      spark = buildSession(cpus)
      warmup(spark, sfDir)
      val probeAfterWarmup = sessionProbe()
      // Prebuild sweep (see ACCOUNTING above): one measured cold run
      // per query, restoring memoized frames before the timed floor.
      // A prebuild crash is recorded (-1) and left for the timed
      // attempts to report properly. NonFatal only — an OOM or other
      // fatal JVM error must abort the bench loudly, not continue
      // timed attempts on a possibly-corrupted session and silently
      // distort the committed floors.
      val cold = all.map { name =>
        val t0 = System.nanoTime()
        val t =
          try {
            SparkEntry.queries(name)(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          } catch { case scala.util.control.NonFatal(_) => -1.0 }
        name -> t
      }.toMap
      val probeAfterPrebuild = sessionProbe()
      val sweepMap = results.toMap
      val sweepCpuMap = resultsCpu.map { case (k, (_, c)) => k -> c }.toMap
      // Locale-pinned numeric formatting: f"$t%.4f" uses the JVM
      // default locale, which in comma-decimal locales (de_DE) emits
      // "1,2345" and corrupts the JSON array.
      def f4(t: Double): String =
        String.format(java.util.Locale.ROOT, "%.4f", Double.box(t))
      // PER-ENTRY ADJUDICATION (round-15, closing the round-14 bisect):
      // a floor >2× its sweep time used to be unexplainable per entry —
      // the bisect proved box CO-TENANCY causes the k–n-alphabet-block
      // clusters, but nothing in the artifact said so per query. Two
      // signals now ride with every entry:
      //   - process-CPU seconds of the chosen attempt, vs the sweep's
      //     (same work + stretched wall = the box, not the plan);
      //   - a PROBE TIMELINE: the canonical session probe re-timed
      //     every 25 entries, so any slow block can be checked against
      //     what the box was doing right then.
      val probeTimeline =
        scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      // A query that fails all isolated attempts is RECORDED
      // (isolated:null + stderr), never dropped — absence from the
      // artifact must mean "not in the sweep", not "crashed quietly".
      val isolated = all.zipWithIndex.map { case (name, idx) =>
        if (idx % 25 == 0) probeTimeline += ((name, sessionProbe()))
        val fn = SparkEntry.queries(name)
        val nAttempts = if (flagged(name)) 3 else 2
        var err: String = null
        val times = (1 to nAttempts).flatMap { _ =>
          val c0 = osBean.getProcessCpuTime
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            Some(((System.nanoTime() - t0) / 1e9,
              (osBean.getProcessCpuTime - c0) / 1e9))
          } catch {
            case e: Throwable =>
              err = s"${e.getClass.getSimpleName}: " +
                Option(e.getMessage).getOrElse("").take(120)
              None
          }
        }
        if (times.isEmpty)
          System.err.println(s"BENCH ISOLATED FAILURE: $name — $err")
        name -> times
      }
      val isoJson = isolated.map { case (name, times) =>
        val sweep = sweepMap.get(name).map(_.toString).getOrElse("null")
        val pri = prior.get(name).map(_.toString).getOrElse("null")
        val best = times.minByOption(_._1)
        val isoV = best.map(_._1.toString).getOrElse("null")
        val cpuS = best.map(b => f4(b._2)).getOrElse("null")
        val att = times.map(t => f4(t._1)).mkString("[", ",", "]")
        val coldV = cold.get(name).filter(_ >= 0)
        val coldS = coldV.map(f4).getOrElse("null")
        val deps = (for (c <- coldV; i <- best.map(_._1))
          yield f4(math.max(0.0, c - i))).getOrElse("null")
        val sweepCpu = sweepCpuMap.get(name).map(f4).getOrElse("null")
        val priCpu = priorCpu.get(name).map(f4).getOrElse("null")
        // contended: the floor blew past 2× its sweep wall while doing
        // ESSENTIALLY THE SAME CPU WORK (≤1.5× sweep CPU) — the
        // co-tenancy signature the round-14 bisect isolated. A floor
        // whose CPU grew with its wall is the query's own doing and
        // stays contended=false for a human to chase.
        val contended = (for {
          b <- best; sw <- sweepMap.get(name); sc <- sweepCpuMap.get(name)
        } yield b._1 > 2 * sw && b._2 <= 1.5 * sc).getOrElse(false)
        // The SYMMETRIC flag (round-16): the SWEEP time blew past 2×
        // this isolated floor while doing essentially the floor's CPU
        // work — the sweep ran on a contended box and the OF-RECORD
        // total overstates the engine. One direction only ever fires
        // per entry; both false = the two runs agree.
        val sweepContended = (for {
          b <- best; sw <- sweepMap.get(name); sc <- sweepCpuMap.get(name)
        } yield BenchAdjud.sweepContended(sw, sc, b._1, b._2))
          .getOrElse(false)
        // The complementary disposition: sweep >2× floor AND sweep CPU
        // >1.5× floor CPU — the box's cycles degraded (the round-16
        // of-record signature). Exactly one of {sweep_contended,
        // cpu_inflated} fires on any sweep entry >2× its floor
        // (partition property pinned by BenchAdjudSpec).
        val cpuInflated = (for {
          b <- best; sw <- sweepMap.get(name); sc <- sweepCpuMap.get(name)
        } yield BenchAdjud.cpuInflated(sw, sc, b._1, b._2))
          .getOrElse(false)
        s""""$name":{"isolated":$isoV,"attempts":$att,"cpu_s":$cpuS,""" +
          s""""cold_s":$coldS,"deps_rebuild_s":$deps,"sweep":$sweep,""" +
          s""""sweep_cpu":$sweepCpu,"prior":$pri,"prior_cpu":$priCpu,""" +
          s""""contended":$contended,"sweep_contended":$sweepContended,""" +
          s""""cpu_inflated":$cpuInflated}"""
      }.mkString("{", ",", "}")
      // Sweep-side adjudication summary: how many entries the flag
      // fired on, and the total with each entry charged min(sweep,
      // floor) — the box-noise-insensitive number to compare across
      // rounds. Computed from the SAME fields the per-entry flags use.
      val floors: Map[String, (Double, Double)] = isolated.flatMap {
        case (name, times) => times.minByOption(_._1).map(b => name -> b)
      }.toMap
      nSweepContended = results.count { case (name, sw) =>
        floors.get(name).exists { case (iso, isoCpu) =>
          sweepCpuMap.get(name).exists(sc =>
            BenchAdjud.sweepContended(sw, sc, iso, isoCpu))
        }
      }
      nCpuInflated = results.count { case (name, sw) =>
        floors.get(name).exists { case (iso, isoCpu) =>
          sweepCpuMap.get(name).exists(sc =>
            BenchAdjud.cpuInflated(sw, sc, iso, isoCpu))
        }
      }
      adjustedTotal = results.map { case (name, sw) =>
        floors.get(name).map(f => math.min(sw, f._1)).getOrElse(sw)
      }.sum
      val timelineJson = probeTimeline.map { case (at, p) =>
        s"""{"at":"$at","probe_s":${f4(p)}}"""
      }.mkString("[", ",", "]")
      // Machine-readable header fields only — round 12 changed
      // "best_of" from the number 3 to a descriptive string, breaking
      // any numeric parse of the artifact across rounds; the split
      // numeric pair carries the same information losslessly.
      val probeEnd = sessionProbe()
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_ISOLATED.json"),
        (s"""{"sf":"$sfDir","unit":"sec","best_of_flagged":3,""" +
          s""""best_of_rest":2,"prebuilt":true,""" +
          s""""n_sweep_contended":$nSweepContended,""" +
          s""""n_cpu_inflated":$nCpuInflated,""" +
          s""""adjusted_total":${f4(adjustedTotal)},""" +
          s""""session_probe_s":{"sweep_session":${f4(probeSweepSession)},""" +
          s""""iso_after_warmup":${f4(probeAfterWarmup)},""" +
          s""""iso_after_prebuild":${f4(probeAfterPrebuild)},""" +
          s""""iso_end":${f4(probeEnd)}},""" +
          s""""probe_timeline":$timelineJson,""" +
          s""""queries":$isoJson}""" + "\n").getBytes("UTF-8"))
    }

    spark.stop()
    // The guaranteed-LAST stdout lines: round 7's driver parse came up
    // null because the summary printed BEFORE the isolated re-run pass,
    // whose log output then flooded the tail capture. Everything that
    // can log (queries, isolated pass, SparkContext shutdown) is done
    // by this point, so these lines are what a tail-parser sees.
    // Adjudication fields (full sweeps only): n_sweep_contended = -1
    // means "not adjudicated" (subset run), never "zero contention".
    val adjudFields =
      if (only.isEmpty)
        s""","n_sweep_contended":$nSweepContended,""" +
          s""""n_cpu_inflated":$nCpuInflated,"adjusted_total":""" +
          String.format(java.util.Locale.ROOT, "%.4f",
            Double.box(adjustedTotal))
      else ""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_queries":${results.size},"n_failed":$nFail$adjudFields,"sf":"$sfDir"}""")
    val finalShort =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":$nFail$adjudFields,"sf":"$sfDir"}"""
    println(finalShort)
    // Re-write the totals artifact WITH the adjudication so the file
    // copy self-describes too (the pre-isolated write above exists so
    // a crash mid-isolated-pass still leaves a parseable record).
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"BENCH_TOTAL$suffix.json"),
      (finalShort + "\n").getBytes("UTF-8"))
    // A bench run whose artifact didn't land is a failed bench, not a
    // quiet one — the files are the only parse-proof record.
    val totalFile = java.nio.file.Paths.get(s"BENCH_TOTAL$suffix.json")
    if (!java.nio.file.Files.exists(totalFile)) {
      System.err.println(s"BENCH FAILURE: $totalFile was not written")
      sys.exit(1)
    }
    if (nFail > 0) sys.exit(1)
  }
}
