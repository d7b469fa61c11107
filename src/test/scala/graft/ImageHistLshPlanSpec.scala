package graft

/** Scale-path assertions for the visual-histogram near-dup family.
  *
  * `image_hist_neardup` is the bounded-sample exact truth twin; the
  * LSH variant must (a) source candidates from the WHOLE corpus — no
  * eval-sample cap anywhere under the candidate join — and (b) get
  * its pairs from a band-bucket equi-join, never an all-pairs shape.
  * Same forced-broadcast methodology as NearDupPlanSpec: with
  * autoBroadcastJoinThreshold = -1 only a hint can emit a
  * BroadcastExchange, so an exchange-free plan proves the
  * per-document frames all shuffle on their keys.
  */
class ImageHistLshPlanSpec extends SparkTestBase {

  test("imageHistogramsAll covers the whole corpus (no sample cap)") {
    val nDocs = Tables.documents(spark, sfDir).count()
    val hist =
      operators.MultimodalPipeline.imageHistogramsAll(spark, sfDir).toDF()
    assert(hist.count() == 8 * nDocs,
      "expected all 8 bins for every document in the corpus")
    assert(hist.select("doc_id").distinct().count() == nDocs,
      "every document must contribute a histogram")
  }

  test("image_hist_lsh plans without forced broadcasts or all-pairs") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("image_hist_lsh")(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"image_hist_lsh must not broadcast a per-document table:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"image_hist_lsh must join on band keys, never all-pairs:\n$plan")
      assert(df.count() > 0, "image_hist_lsh returned no rows")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("measured recall vs the exact-twin truth set") {
    // Truth: ALL L1-near-dup pairs among the corpus (brute force over
    // the collected histograms — test SF only). LSH recall = found /
    // truth; the capped band join trades some recall for bounded
    // buckets, so this pins the trade at a measured floor instead of
    // leaving it anecdotal (the LshRecallSpec discipline applied to
    // the visual family).
    val hist = operators.MultimodalPipeline
      .imageHistogramsAll(spark, sfDir).toDF()
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        val byBin = rows.map(r => r.getInt(1) -> r.getLong(2)).toMap
        id -> ((0 until 8).map(byBin(_)), rows.head.getLong(3))
      }
    val ids = hist.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices; j <- i + 1 until ids.size
      a = ids(i); b = ids(j)
      (ha, na) = hist(a); (hb, nb) = hist(b)
      l1 = (0 until 8).map(k => math.abs(ha(k) * nb - hb(k) * na)).sum
      if l1 * 10 <= na * nb
    } yield (a, b)).toSet
    val found = SparkEntry.queries("image_hist_lsh")(spark, sfDir)
      .select("a", "b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(truth.nonEmpty, "degenerate fixture: no true near-dups")
    assert((found -- truth).isEmpty,
      "precision must be 1.0 — every emitted pair passes the exact L1")
    val recallPct = 100.0 * found.size / truth.size
    info(f"image_hist_lsh recall: ${found.size}/${truth.size} " +
      f"($recallPct%.1f%%) at cap ${operators.MultimodalQueries.HistBucketCap}")
    assert(recallPct >= 20.0,
      s"recall collapsed below the measured floor: $recallPct%")
  }

  test("eval corpus recall exceeds 80% with the cap still active") {
    // The clustered-palette eval corpus exists precisely so this
    // number means something: near-dups are ≤3-pixel palette
    // perturbations, non-dups are 8-pixel steps, and the only recall
    // loss is genuine quantization-boundary misses. The production
    // generator (same keys, same cap) must clear 80% here — if it
    // drops below, banding or quantization regressed, not the
    // fixture.
    val row = SparkEntry.queries("image_hist_eval")(spark, sfDir)
      .collect().head
    val nTruth = row.getAs[Long]("n_truth")
    val nTp = row.getAs[Long]("n_tp")
    val recallPpm = row.getAs[Long]("recall_ppm")
    info(s"image_hist_eval: $nTp/$nTruth true pairs found " +
      s"(${recallPpm / 10000.0}%), " +
      s"${row.getAs[Long]("n_poisoned_buckets")} poisoned buckets")
    assert(nTruth > 0, "degenerate eval corpus: no true near-dups")
    assert(recallPpm > 800000L,
      s"eval recall fell to ${recallPpm}ppm — the banded generator " +
        "regressed (the corpus is designed for ~890000)")
  }

  test("every emitted pair is a true near-dup sharing a viable band") {
    import org.apache.spark.sql.functions._
    val hist = operators.MultimodalPipeline
      .imageHistogramsAll(spark, sfDir).toDF()
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        val byBin = rows.map(r => r.getInt(1) -> r.getLong(2)).toMap
        val np = rows.head.getLong(3)
        id -> ((0 until 8).map(byBin(_)), np)
      }
    // Independent driver-side replay of the contract over the small
    // fixture: band keys, viability cap, exact L1 threshold.
    def bandKeys(h: Seq[Long], np: Long): Seq[(Int, Long, Long)] =
      (0 until 4).map(b => (b, 32 * h(2 * b) / np, 32 * h(2 * b + 1) / np))
    val buckets = hist.toSeq
      .flatMap { case (id, (h, np)) =>
        bandKeys(h, np).map(k => k -> id)
      }
      .groupBy(_._1)
      .collect {
        case (_, members)
            if members.size >= 2 &&
              members.size <= operators.MultimodalQueries.HistBucketCap =>
          members.map(_._2).sorted
      }
    val allCand: Set[(Long, Long)] = buckets
      .flatMap(ids =>
        for (i <- ids.indices; j <- i + 1 until ids.size)
          yield (ids(i), ids(j)))
      .toSet
    val expected = allCand
      .filter { case (a, b) =>
        val (ha, na) = hist(a)
        val (hb, nb) = hist(b)
        val l1 = (0 until 8).map(k =>
          math.abs(ha(k) * nb - hb(k) * na)).sum
        l1 * 10 <= na * nb
      }
    val got = SparkEntry.queries("image_hist_lsh")(spark, sfDir)
      .select("a", "b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == expected,
      s"pair set mismatch: extra=${(got -- expected).take(5)} " +
        s"missing=${(expected -- got).take(5)}")
  }
}
