package graft

/** Recall of the LSH-bucketed ANN paths against the exact brute-force
  * baseline. Multi-probe (own bucket + Hamming-1 neighbors) exists to
  * repair the recall the single-bucket path loses for vectors near a
  * hyperplane, so it must never do worse than single-bucket, and must
  * clear an absolute floor on the fixture embeddings.
  */
class LshRecallSpec extends SparkTestBase {

  test("filtered search honors the predicate and never post-filters") {
    import org.apache.spark.sql.functions._
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"))
    val rows = SparkEntry.queries("cosine_topk_lsh_filtered")(
        spark, sfDir)
      .join(labels.withColumnRenamed("label", "clabel"), "vec_id")
      .join(
        labels.select(col("vec_id").as("qid"),
          col("label").as("qlabel")),
        "qid")
      .collect()
    assert(rows.nonEmpty)
    // Every returned neighbor satisfies the query's predicate...
    rows.foreach(r =>
      assert(r.getAs[Int]("clabel") == r.getAs[Int]("qlabel"),
        s"neighbor violates the label predicate: $r"))
    // ...and ranks are contiguous from 1 per query — the filter ran
    // BEFORE ranking (post-filtering would leave rank gaps).
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      val rnks = rs.map(_.getAs[Int]("rnk")).sorted.toSeq
      assert(rnks == (1 to rnks.size),
        s"query $qid has non-contiguous ranks $rnks — " +
          "predicate applied after ranking?")
    }
  }

  private def topkSets(name: String): Map[Long, Set[Long]] =
    SparkEntry
      .queries(name)(spark, sfDir)
      .select("qid", "vec_id")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  test("multi-probe recall ≥ single-bucket recall, above floor") {
    val brute = topkSets("cosine_topk_brute")
    val single = topkSets("cosine_topk_lsh")
    val probe = topkSets("cosine_topk_lsh_probe")

    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = brute.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble /
          truth.size
      }
      per.sum / per.size
    }

    val rSingle = recall(single)
    val rProbe = recall(probe)
    info(f"recall@5 single-bucket=$rSingle%.2f multi-probe=$rProbe%.2f")
    assert(rProbe >= rSingle,
      s"multi-probe ($rProbe) must not lose recall vs single ($rSingle)")
    // Absolute floor: 4 planes = 16 buckets, and probing 5 of them
    // covers ~31% of the space for near-random fixture vectors, so
    // ~0.4 measured recall is the structural ceiling here (more
    // planes + more probes is the real-N configuration); 0.3 catches
    // a probing regression without flaking on the fixture.
    assert(rProbe >= 0.3, s"multi-probe recall too low: $rProbe")
  }

  test("IVF nprobe=2 recall ≥ nprobe=1 recall") {
    val brute = topkSets("cosine_topk_brute")
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = brute.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble /
          truth.size
      }
      per.sum / per.size
    }
    val r1 = recall(topkSets("ivf_topk"))
    val r2 = recall(topkSets("ivf_topk_probe2"))
    info(f"recall@5 ivf nprobe1=$r1%.2f nprobe2=$r2%.2f")
    assert(r2 >= r1,
      s"nprobe=2 ($r2) must not lose recall vs nprobe=1 ($r1)")
  }

  test("high-recall config (2 tables × radius-2 probe) recall ≥ 0.8") {
    val brute = topkSets("cosine_topk_brute")
    val hi = topkSets("cosine_topk_lsh_hi")
    val per = brute.map { case (q, truth) =>
      hi.getOrElse(q, Set.empty).intersect(truth).size.toDouble /
        truth.size
    }
    val recall = per.sum / per.size
    info(f"recall@5 hi-config=$recall%.2f")
    // The production point on the recall/cost curve: ≥0.8 recall on
    // near-random fixture vectors (LSH's worst case — real clustered
    // corpora collide far more at the same cost). Expected ~0.9+:
    // radius-2 probing reaches ~0.89 per table, two tables ~0.99.
    assert(recall >= 0.8, s"hi-config recall too low: $recall")
  }
}
