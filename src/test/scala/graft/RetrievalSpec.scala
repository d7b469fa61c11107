package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Quality checks for the training-pair and retrieval operators that
  * the DuckDB gate cannot express: hard-negative mining recall against
  * the exact different-label baseline, and the fusion contract (every
  * fused hit is backed by at least one source ranking).
  */
class RetrievalSpec extends SparkTestBase {

  test("hard_negatives recall vs brute-force different-label top-k") {
    import graft.functions.Vectors._
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("qlabel"))
    val w = Window.partitionBy("qid")
      .orderBy(col("sim").desc, col("vec_id").asc)
    val brute = broadcast(q)
      .join(emb, col("qid") =!= col("vec_id") &&
        col("qlabel") =!= col("label"))
      .withColumn("sim", cosine(col("qe"), col("embedding")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("qid", "vec_id")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (k, rows) => k -> rows.map(_.getLong(1)).toSet }
    val mined = SparkEntry.queries("hard_negatives")(spark, sfDir)
      .select("qid", "vec_id")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (k, rows) => k -> rows.map(_.getLong(1)).toSet }
    val per = brute.map { case (k, truth) =>
      mined.getOrElse(k, Set.empty).intersect(truth).size.toDouble /
        truth.size
    }
    val recall = per.sum / per.size
    info(f"hard-negative recall@5 = $recall%.2f")
    // Same structural ceiling as cosine_topk_lsh_probe (single table,
    // Hamming-1): the label filter only shrinks both sides in step.
    assert(recall >= 0.3, s"hard-negative recall too low: $recall")
  }

  test("every fused RRF hit is backed by a source ranking") {
    val fused = SparkEntry.queries("rrf_fusion")(spark, sfDir)
    // Minimum possible single-source contribution is rank 10 →
    // 1000000 DIV 70 = 14285; anything below means a phantom row.
    val bad = fused.filter(col("rrf_ppm") < 14285).count()
    assert(bad == 0, s"$bad fused rows with impossible RRF mass")
    // Top-5 per query, exactly 5 queries on the fixture.
    val counts = fused.groupBy("qid").count().collect()
    assert(counts.length == 5 && counts.forall(_.getLong(1) <= 5))
  }

  test("knn_accuracy confusion matrix covers all 50 eval queries") {
    val rows = SparkEntry.queries("knn_accuracy")(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 50L,
      "every eval query lands in exactly one confusion cell")
    val labels = Tables.embeddings(spark, sfDir)
      .select("label").distinct().collect()
      .map(_.getAs[Int]("label")).toSet
    rows.foreach { r =>
      assert(labels.contains(r.getAs[Int]("true_label")))
      assert(labels.contains(r.getAs[Int]("pred_label")))
      assert(r.getAs[Long]("n") >= 1L)
    }
  }

  test("knn_suspects = exactly the off-diagonal of knn_accuracy") {
    val suspects = SparkEntry.queries("knn_suspects")(spark, sfDir)
      .collect()
    val offDiag = SparkEntry.queries("knn_accuracy")(spark, sfDir)
      .collect()
      .filter(r => r.getAs[Int]("true_label") !=
        r.getAs[Int]("pred_label"))
      .map(_.getAs[Long]("n")).sum
    assert(suspects.length.toLong == offDiag,
      "the suspect queue must enumerate the confusion off-diagonal")
    suspects.foreach { r =>
      assert(r.getAs[Int]("true_label") != r.getAs[Int]("pred_label"))
      val v = r.getAs[Long]("votes")
      assert(v >= 1L && v <= 5L)
    }
  }

  test("cluster_purity: cells partition the corpus, majority is honest") {
    val rows = SparkEntry.queries("cluster_purity")(spark, sfDir)
      .collect()
    val nVecs = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nVecs,
      "nprobe=1 assignment must place every vector in one cell")
    rows.foreach { r =>
      val (n, nMaj) = (r.getAs[Long]("n"), r.getAs[Long]("n_maj"))
      assert(nMaj >= 1L && nMaj <= n)
      assert(r.getAs[Long]("purity_ppm") == 1000000L * nMaj / n)
      // A majority label must hold at least its fair share of a
      // uniform split across the labels present in the corpus.
      assert(r.getAs[Long]("purity_ppm") >= 1000000L / math.max(1, n))
    }
  }
}
