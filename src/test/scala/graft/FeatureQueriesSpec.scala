package graft

import org.apache.spark.sql.functions._

/** Structural properties of the training-data-prep family that the
  * value-level oracle cannot see:
  *
  *   - span corruption is LOSSLESS: substituting each target span
  *     back into its corrupted sentinel reproduces the original
  *     token stream exactly, for every document;
  *   - the mask selection is a pure function of (doc_id, pos) — the
  *     hashed draw is invariant under repartitioning (the property
  *     that makes the pair generation reproducible across cluster
  *     layouts);
  *   - feature hashing stays within its declared dimensionality and
  *     the chi2 report is shaped (5 langs × 5 ranked rows).
  */
class FeatureQueriesSpec extends SparkTestBase {

  test("span corruption is lossless under sentinel substitution") {
    val rows = SparkEntry.queries("span_corrupt")(spark, sfDir)
      .collect()
    assert(rows.length > 0)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        array_join(
          filter(split(trim(col("text")), "\\s+"),
            t => length(t) > 0), " ").as("orig"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    var maskedTotal = 0L
    var tokensTotal = 0L
    rows.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val corrupted = r.getAs[String]("corrupted")
      val target = r.getAs[String]("target")
      maskedTotal += r.getAs[Long]("n_masked")
      tokensTotal += r.getAs[Long]("n_tokens")
      // target = "<extra_id_0> tok tok <extra_id_1> tok ..." — split
      // into span texts keyed by sentinel.
      val spans = "<extra_id_(\\d+)>".r
        .split(target).drop(1).map(_.trim)
      val restored = corrupted.split(" ").flatMap { t =>
        "<extra_id_(\\d+)>".r.findFirstMatchIn(t) match {
          case Some(m) => spans(m.group(1).toInt).split(" ")
          case None => Array(t)
        }
      }.mkString(" ")
      assert(restored == docs(docId),
        s"doc $docId: sentinel substitution does not restore original")
    }
    // ≈1/5 of positions masked (binomial tolerance at corpus size).
    val rate = maskedTotal.toDouble / tokensTotal
    assert(rate > 0.15 && rate < 0.25, s"mask rate $rate off target 0.2")
  }

  test("mask draw and feature hash are partition-invariant") {
    def run(name: String) =
      SparkEntry.queries(name)(spark, sfDir).collect().toSeq
    val sc1 = run("span_corrupt")
    val fh1 = run("feature_hash")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      assert(run("span_corrupt") == sc1)
      assert(run("feature_hash") == fh1)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(fh1.forall { r =>
      val b = r.getAs[Int]("bucket"); b >= 0 && b < 64
    })
  }

  test("auc_quality matches a brute-force pairwise AUC") {
    val r = SparkEntry.queries("auc_quality")(spark, sfDir)
      .collect().head
    // Brute force: over all (pos, neg) pairs count wins + half-ties.
    val rows = Tables.documents(spark, sfDir)
      .select(col("n_chars"), (col("lang") === "en").as("pos"))
      .collect()
      .map(x => (x.getLong(0), x.getBoolean(1)))
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expected = 1000000L * wins2 / (2L * pos.length * neg.length)
    assert(r.getAs[Long]("n_pos") == pos.length)
    assert(r.getAs[Long]("n_neg") == neg.length)
    assert(r.getAs[Long]("auc_ppm") == expected,
      s"rank-sum AUC ${r.getAs[Long]("auc_ppm")} != pairwise $expected")
  }

  test("pr_curve: thresholds fall, recall rises, decile 10 keeps all") {
    val rows = SparkEntry.queries("pr_curve")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("decile"))
    assert(rows.length == 10)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("threshold") >= b.getAs[Long]("threshold"))
      assert(a.getAs[Long]("rec_ppm") <= b.getAs[Long]("rec_ppm"))
      assert(a.getAs[Long]("tp") <= b.getAs[Long]("tp"))
    }
    val last = rows.last
    assert(last.getAs[Long]("rec_ppm") == 1000000L,
      "decile 10 must keep every row, so recall is exactly 1")
    assert(last.getAs[Long]("fn") == 0L)
  }

  test("event_transitions rows are per-source stochastic") {
    val rows = SparkEntry.queries("event_transitions")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("src")).foreach { case (src, rs) =>
      val pSum = rs.map(_.getAs[Long]("p_ppm")).sum
      // Integer floor division loses at most (n_dst − 1) ppm total.
      assert(pSum <= 1000000L && pSum > 1000000L - rs.length,
        s"$src row sums to $pSum ppm")
    }
  }

  test("event_ngrams: trigram counts bounded by the transition counts") {
    val tri = SparkEntry.queries("event_ngrams")(spark, sfDir).collect()
    assert(tri.nonEmpty && tri.length <= 20)
    val ns = tri.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // Every trigram (t1,t2,t3) is a witness of the bigram (t1,t2), so
    // its count cannot exceed that transition's count.
    val big = SparkEntry.queries("event_transitions")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) ->
        r.getAs[Long]("n")).toMap
    tri.foreach { r =>
      val key = (r.getAs[String]("t1"), r.getAs[String]("t2"))
      assert(r.getAs[Long]("n") <= big.getOrElse(key, 0L),
        s"trigram $key exceeds its bigram count")
    }
  }

  test("dow_anomaly: top-10 by z², scores internally consistent") {
    val rows = SparkEntry.queries("dow_anomaly")(spark, sfDir).collect()
    assert(rows.length == 10)
    val zs = rows.map(_.getAs[Long]("z2_ppm"))
    assert(zs.zip(zs.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val dev = r.getAs[Long]("dev")
      assert(r.getAs[Long]("var_num") > 0,
        "a dow group with zero variance cannot be scored")
      assert(r.getAs[Long]("z2_ppm") ==
        1000000L * dev * dev / r.getAs[Long]("var_num"))
      val dow = r.getAs[Long]("dow")
      assert(dow >= 1L && dow <= 7L)
    }
  }

  test("funnel_latency: ordered percentiles, counts bound by funnel") {
    val rows = SparkEntry.queries("funnel_latency")(spark, sfDir)
      .collect().map(r => r.getAs[String]("stage") -> r).toMap
    assert(rows.keySet == Set("view_to_click", "click_to_purchase"))
    rows.values.foreach { r =>
      val (mn, p50, p90, mx) = (r.getAs[Long]("min_s"),
        r.getAs[Long]("p50_s"), r.getAs[Long]("p90_s"),
        r.getAs[Long]("max_s"))
      assert(mn >= 0L, "latency after the gating stage cannot be negative")
      assert(mn <= p50 && p50 <= p90 && p90 <= mx,
        s"percentiles out of order: $mn $p50 $p90 $mx")
    }
    // Funnel monotonicity: converters at a later stage are a subset.
    assert(rows("click_to_purchase").getAs[Long]("n") <=
      rows("view_to_click").getAs[Long]("n"))
  }

  test("open_orders_daily: sweep-line conserves and never dips below 0") {
    val rows = SparkEntry.queries("open_orders_daily")(spark, sfDir)
      .collect().sortBy(_.getAs[String]("day"))
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_open") >= 0L,
      "an order closed before it opened"))
    assert(rows.map(_.getAs[Long]("delta")).sum == 0L,
      "every opened order must eventually close")
    assert(rows.last.getAs[Long]("n_open") == 0L)
    // Conservation: the peak backlog is bounded by total orders.
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_open")).max <= nOrders)
  }

  test("abc_classification: classes partition parts, A dominates") {
    val rows = SparkEntry.queries("abc_classification")(spark, sfDir)
      .collect().map(r => r.getAs[String]("abc_class") -> r).toMap
    assert(rows.keySet == Set("A", "B", "C"))
    val nParts = Tables.lineitem(spark, sfDir)
      .select("l_partkey").distinct().count()
    assert(rows.values.map(_.getAs[Long]("n_parts")).sum == nParts)
    val shares = rows.map { case (k, r) =>
      k -> r.getAs[Long]("share_ppm") }
    // The A class crosses the 80% line (straddler included), B ends
    // past 95%, and shares telescope to ~100%.
    assert(shares("A") >= 800000L)
    assert(shares("A") + shares("B") >= 950000L)
    val tot = shares.values.sum
    assert(tot >= 999997L && tot <= 1000000L,
      s"class shares sum to $tot ppm")
    // Class efficiency: A's revenue-per-part can never be worse than
    // C's (it holds the highest-revenue parts by construction). The
    // near-uniform fixture makes A the LARGEST class — the classes
    // describe the data honestly rather than assuming a power law.
    val revPerPart = rows.map { case (k, r) =>
      k -> (r.getAs[Long]("revenue_cents").toDouble /
        r.getAs[Long]("n_parts")) }
    assert(revPerPart("A") >= revPerPart("B") &&
      revPerPart("B") >= revPerPart("C"))
  }

  test("token_drift matches a driver-side count replay") {
    val rows = SparkEntry.queries("token_drift")(spark, sfDir)
      .collect()
    assert(rows.length == 20)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val h = docs.length / 2
    def counts(half: Int): Map[String, Long] =
      docs.filter(d => if (half == 1) d._1 < h else d._1 >= h)
        .flatMap(_._2.trim.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (t, o) => t -> o.length.toLong }
    val (m1, m2) = (counts(1), counts(2))
    val (t1, t2) = (m1.values.sum, m2.values.sum)
    rows.foreach { r =>
      val tok = r.getAs[String]("tok")
      val (c1, c2) = (m1.getOrElse(tok, 0L), m2.getOrElse(tok, 0L))
      assert(r.getAs[Long]("c1") == c1 && r.getAs[Long]("c2") == c2)
      val num = c1 * t2 - c2 * t1
      val want =
        if (num >= 0) 1000000L * num / (t1 * t2)
        else -(1000000L * -num / (t1 * t2))
      assert(r.getAs[Long]("drift_ppm") == want, s"token $tok")
    }
  }

  test("token_burstiness: ratios honest, threshold respected") {
    val rows = SparkEntry.queries("token_burstiness")(spark, sfDir)
      .collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (cf, df) = (r.getAs[Long]("cf"), r.getAs[Long]("df"))
      assert(df >= 10L && cf >= df,
        "collection frequency cannot undercut document frequency")
      assert(r.getAs[Long]("burst_ppm") == 1000000L * cf / df)
    }
    val bs = rows.map(_.getAs[Long]("burst_ppm"))
    assert(bs.zip(bs.tail).forall { case (a, b) => a >= b })
  }

  test("revenue_gini matches brute mean-absolute-difference Gini") {
    val rows = SparkEntry.queries("revenue_gini")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val perCust = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("c_custkey"))
      .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))"
        + " DIV 100000 AS BIGINT)").as("x"))
      .collect()
      .groupBy(_.getAs[String]("seg"))
      .map { case (sg, rs) => sg -> rs.map(_.getAs[Long]("x")) }
    rows.foreach { r =>
      val xs = perCust(r.getAs[String]("segment"))
      val n = xs.length.toLong
      val s = xs.sum
      // Gini ≡ mean absolute difference / (2·mean): the rank formula
      // must equal the definitional O(n²) form exactly.
      val mad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
      assert(mad == 2L * r.getAs[Long]("gini_num"),
        s"rank-formula Gini diverges from MAD form in ${r.get(0)}")
      assert(r.getAs[Long]("n_cust") == n)
      assert(r.getAs[Long]("gini_ppm") ==
        1000000L * r.getAs[Long]("gini_num") / (n * s))
      val topShare = r.getAs[Long]("top10_share_ppm")
      // Concentration sanity: the top decile holds at least its
      // uniform share.
      assert(topShare >= 1000000L / 10 - 1)
      assert(topShare <= 1000000L)
    }
  }

  test("daily_active_rollup: WAU bounds DAU, new users telescope") {
    val rows = SparkEntry.queries("daily_active_rollup")(spark, sfDir)
      .collect().sortBy(_.getAs[String]("day"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("wau") >= r.getAs[Long]("dau"),
        "a day's actives are a subset of its trailing week's")
      assert(r.getAs[Long]("n_new") <= r.getAs[Long]("dau"))
    }
    // Every user is new exactly once: new-user counts sum to the
    // distinct user population.
    val nUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_new")).sum == nUsers)
    // First active day: everyone present is new.
    assert(rows.head.getAs[Long]("n_new") ==
      rows.head.getAs[Long]("dau"))
  }

  test("cohort_revenue: non-negative offsets, buyers bound purchases") {
    val rows = SparkEntry.queries("cohort_revenue")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("week_offset") >= 0L,
        "a purchase cannot precede its user's first activity")
      assert(r.getAs[Long]("n_buyers") <= r.getAs[Long]("n_purchases"))
      assert(r.getAs[Long]("n_buyers") >= 1L)
    }
  }

  test("embedding_drift matches a driver-side quantized replay") {
    val rows = SparkEntry.queries("embedding_drift")(spark, sfDir)
      .collect().map(r => r.getAs[Int]("dim") -> r).toMap
    assert(rows.size == 64)
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Float]]("embedding")))
    val h = vecs.length / 2
    def q(x: Float): Long = math.floor(x.toDouble * 1000.0 + 0.5).toLong
    for (dim <- 0 until 64) {
      val fst = vecs.filter(_._1 < h).map(v => q(v._2(dim)))
      val snd = vecs.filter(_._1 >= h).map(v => q(v._2(dim)))
      val r = rows(dim)
      assert(r.getAs[Long]("n1") == fst.length)
      assert(r.getAs[Long]("s1") == fst.sum)
      assert(r.getAs[Long]("s2") == snd.sum)
      val num = fst.sum * snd.length - snd.sum * fst.length
      val den = fst.length.toLong * snd.length
      val want = if (num >= 0) 1000 * num / den else -(1000 * -num / den)
      assert(r.getAs[Long]("drift_micro") == want, s"dim $dim")
    }
  }

  test("langid_confusion: cells partition the corpus and tie to lang_id") {
    val cells = SparkEntry.queries("langid_confusion")(spark, sfDir)
      .collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(cells.map(_.getAs[Long]("n")).sum == nDocs)
    cells.groupBy(_.getAs[String]("lang")).foreach { case (g, rs) =>
      val total = rs.head.getAs[Long]("n_gold")
      assert(rs.map(_.getAs[Long]("n")).sum == total,
        s"gold-row total mismatch for $g")
      rs.foreach(r => assert(r.getAs[Long]("share_ppm") ==
        1000000L * r.getAs[Long]("n") / total))
    }
    // Column-marginals must reproduce lang_id's per-prediction counts.
    val predTotals = cells.groupBy(_.getAs[String]("pred_lang"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("n")).sum }
    val langId = SparkEntry.queries("lang_id")(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("pred_lang") -> r.getAs[Long]("n_docs"))
      .toMap
    assert(predTotals == langId,
      "confusion column marginals must equal the lang_id report")
  }

  test("minhash_eval: confusion counts internally consistent") {
    val r = SparkEntry.queries("minhash_eval")(spark, sfDir)
      .collect().head
    val (t, c, tp) = (r.getAs[Long]("n_truth"), r.getAs[Long]("n_cand"),
      r.getAs[Long]("n_tp"))
    assert(tp <= math.min(t, c), "TP cannot exceed either side")
    if (c > 0)
      assert(r.getAs[Long]("precision_ppm") == 1000000L * tp / c)
    if (t > 0)
      assert(r.getAs[Long]("recall_ppm") == 1000000L * tp / t)
  }

  test("token_chi2: 5 ranked rows per language, chi2 descending") {
    val rows = SparkEntry.queries("token_chi2")(spark, sfDir).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to 5),
        s"$lang ranks not 1..5")
      val chis = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("chi2"))
      assert(chis.zip(chis.tail).forall { case (a, b) => a >= b },
        s"$lang chi2 not descending")
    }
  }
}
