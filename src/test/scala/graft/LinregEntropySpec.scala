package graft

import org.apache.spark.sql.functions._

/** Closed-form checks for the grouped-OLS and integer-entropy
  * queries: a perfectly linear synthetic series recovers its exact
  * slope/intercept, and the q16 entropy hits its analytic endpoints
  * (0 for a constant stream, ~log2 k for a uniform one).
  */
class LinregEntropySpec extends SparkTestBase {

  test("linreg query runs; fixture slopes are finite and fractions consistent") {
    val rows = SparkEntry.queries("linreg_daily_revenue")(spark, sfDir)
      .collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val num = r.getAs[Long]("slope_num")
      val den = r.getAs[Long]("slope_den")
      val slope = r.getAs[Double]("slope")
      assert(den > 0, "x variance must be positive over the fixture")
      assert(slope == num.toDouble / den.toDouble)
      assert(!slope.isNaN && !r.getAs[Double]("intercept").isNaN)
    }
  }

  test("OLS sufficient statistics recover an exact linear series") {
    import spark.implicits._
    // y = 7x + 3 exactly: slope_num/slope_den must reduce to 7,
    // intercept to 3 (all arithmetic exact integers until the final
    // single divisions).
    val pts = (0L to 50L).map(x => ("g", x, 7 * x + 3))
    val st = pts.toDF("g", "x", "y")
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den"),
        col("n"), col("sx"), col("sy"))
      .collect()(0)
    val slope = st.getAs[Long]("num").toDouble / st.getAs[Long]("den")
    assert(slope == 7.0)
    val intercept =
      (st.getAs[Long]("sy").toDouble - slope * st.getAs[Long]("sx")) /
        st.getAs[Long]("n")
    assert(intercept == 3.0)
  }

  test("q16 entropy endpoints: constant ≈ 0, uniform ≈ 16·log2 k") {
    val q = graft.operators.UnigramQueries.q16 _
    // Constant stream: c = N → every term q16(N) − q16(N) = 0.
    assert(q(64) - q(64) == 0L)
    // Uniform over k=16 tokens, 4 occurrences each (N=64):
    // H_q16 = Σ 4·(q16(64) − q16(4)) = 64·(96 − 32) / ... exact:
    val h = (1 to 16).map(_ => 4L * (q(64) - q(4))).sum
    assert(h == 64 * 16 * 4, s"uniform entropy $h") // 16·log2(16)=64 per token
    // And the registered query agrees with a direct recompute of one
    // document's entropy.
    val res = SparkEntry.queries("token_entropy_q16")(spark, sfDir)
      .filter(col("doc_id") === 0).collect()
    if (res.nonEmpty) {
      val r = res(0)
      val text = Tables.documents(spark, sfDir)
        .filter(col("doc_id") === 0).collect()(0)
        .getAs[String]("text")
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val n = toks.length.toLong
      val want = toks.groupBy(identity).values
        .map(g => g.length.toLong * (q(n) - q(g.length.toLong))).sum
      assert(r.getAs[Long]("entropy_q16") == want)
      assert(r.getAs[Long]("n_tokens") == n)
    }
  }

  test("acf_daily: 7 lags, Pearson r in [-1,1], n shrinks with lag") {
    val rows = SparkEntry.queries("acf_daily")(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("lag"))
    assert(rows.map(_.getAs[Long]("lag")).toSeq == (1L to 7L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n") >= b.getAs[Long]("n"),
        "pair count cannot grow with lag")
    }
    rows.foreach { r =>
      val (num, d1, d2) = (r.getAs[Long]("num"),
        r.getAs[Long]("den1"), r.getAs[Long]("den2"))
      assert(d1 >= 0 && d2 >= 0, "variance terms must be non-negative")
      // Cauchy-Schwarz on the exact integers: num² ≤ den1·den2,
      // compared in double to dodge the num² overflow — the bound
      // check tolerates the ~2⁻⁵² slack, the sign does not.
      val r2 = num.toDouble * num.toDouble / (d1.toDouble * d2.toDouble)
      assert(r2 <= 1.0 + 1e-9, s"lag ${r.getAs[Long]("lag")}: |r| > 1")
    }
  }

  test("calibration_bins: bins partition the corpus, ppm ranges hold") {
    val rows = SparkEntry.queries("calibration_bins")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("bin"))
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nDocs,
      "every document lands in exactly one calibration bin")
    rows.foreach { r =>
      val bin = r.getAs[Int]("bin")
      assert(bin >= 0 && bin <= 9)
      val mp = r.getAs[Long]("mean_pred_ppm")
      // Mean predicted ECDF must sit inside the bin's own range
      // (bin 9 absorbs the p̂ = 1e6 endpoint).
      assert(mp >= bin * 100000L &&
        (mp < (bin + 1) * 100000L || (bin == 9 && mp <= 1000000L)),
        s"bin $bin mean_pred $mp outside its range")
      val ap = r.getAs[Long]("actual_ppm")
      assert(ap >= 0L && ap <= 1000000L)
    }
  }
}
