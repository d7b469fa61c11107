package graft

/** The PCA family's two structural claims, asserted:
  *
  *   1. the covariance pass is JOIN-FREE — a narrow per-row d²
  *      expansion feeding one hash aggregate (the 100 TB design: the
  *      only shuffle is d² partial-sum rows per map partition), never
  *      an exploded self-join;
  *   2. the fixed-point integer eigenvector actually converges onto
  *      the dominant eigenvector of the true double-precision
  *      covariance (determinism never depended on convergence, but an
  *      iterate pointing nowhere would make the projection query
  *      meaningless).
  */
class PcaSpec extends SparkTestBase {

  test("covariance plan is join-free: explode + one hash aggregate") {
    // covBuild, not the registered query: the registered frame is
    // pinned (checkpoint scan), which hides the builder's plan.
    val plan = graft.operators.PcaQueries.covBuild(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"covariance pass should not join:\n$plan")
    assert(plan.contains("Generate"),
      "expected posexplode Generate nodes")
    assert(plan.contains("HashAggregate"),
      "expected hash aggregation of the sufficient statistics")
  }

  test("integer eigenvector converges on the double-PCA direction") {
    // True double-precision covariance + power iteration, straight
    // from the parquet, with no fixed-point tricks.
    val emb = Tables.embeddings(spark, sfDir)
      .collect()
      .map(_.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
    val d = emb.head.length
    val n = emb.length
    val mean = Array.tabulate(d)(i => emb.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      emb.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n)
    var v = Array.fill(d)(1.0)
    for (_ <- 0 until 200) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }

    val got = SparkEntry.queries("pca_power_topvec")(spark, sfDir)
      .collect().sortBy(_.getInt(0)).map(_.getLong(1).toDouble)
    val gn = math.sqrt(got.map(x => x * x).sum)
    val cos = math.abs(
      got.zip(v).map { case (a, b) => a / gn * b }.sum)
    assert(cos > 0.99,
      s"fixed-point eigenvector diverges from double PCA: |cos|=$cos")

    // And the projection top-1 agrees with the double projection.
    val top = SparkEntry.queries("pca_project_topk")(spark, sfDir)
      .collect().head.getAs[Long]("vec_id")
    val ids = Tables.embeddings(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0))
    val sign = if (got.zip(v).map { case (a, b) => a * b }.sum < 0) -1 else 1
    val bestDouble = ids.zip(emb).maxBy { case (_, e) =>
      sign * e.zip(v).zip(mean).map { case ((x, vi), m) => (x - m) * vi }.sum
    }._1
    assert(top == bestDouble,
      s"projection top-1 $top != double-PCA top-1 $bestDouble")
  }

  test("pca_top_corr: 10 ordered pairs with corr² in [0,1]") {
    val rows = SparkEntry.queries("pca_top_corr")(spark, sfDir)
      .collect()
    assert(rows.length == 10)
    val corrs = rows.map(_.getAs[Double]("corr2"))
    assert(corrs.zip(corrs.tail).forall { case (a, b) => a >= b },
      "corr² not descending")
    rows.foreach { r =>
      assert(r.getAs[Int]("i") < r.getAs[Int]("j"))
      val c2 = r.getAs[Double]("corr2")
      assert(c2 >= 0.0 && c2 <= 1.0, s"corr² $c2 out of range")
    }
  }

  test("oracle SQL registered for every pca query") {
    Seq("pca_covariance", "pca_power_topvec", "pca_project_topk",
      "pca_top_corr")
      .foreach { q =>
        assert(SparkEntry.oracleSql.contains(q), s"missing oracle: $q")
      }
  }
}
