package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The persisted ANN index (operators.AnnIndexQueries) must serve the
  * SAME answers as the in-session ANN queries, and the serve plans
  * must read ONLY the written index tables — that isolation is the
  * whole point of the build/serve split (at 100 TB the serving tier
  * never touches the raw corpus).
  */
class AnnIndexSpec extends SparkTestBase {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  /** Every parquet location scanned by `df`'s executed plan. */
  private def scannedPaths(df: DataFrame): Seq[String] = {
    val executed = df.queryExecution.executedPlan
    val plan = executed match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectWithSubqueries {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
  }

  test("serve results identical to in-session twins") {
    assert(run("ann_index_query").collect().toSeq ===
      run("cosine_topk_lsh_hi").collect().toSeq)
    assert(run("ann_index_ivfpq").collect().toSeq ===
      run("ivfpq_topk").collect().toSeq)
  }

  test("serve plans scan only index tables, never the source") {
    for (name <- Seq("ann_index_query", "ann_index_ivfpq")) {
      val paths = scannedPaths(run(name))
      assert(paths.nonEmpty, s"$name: no file scans found")
      val offenders = paths.filterNot(_.contains("graft_ann_index"))
      assert(offenders.isEmpty,
        s"$name reads outside the persisted index: $offenders")
    }
  }

  test("each append touches only its own delta layer") {
    import org.apache.spark.sql.functions.{max, min}
    val idx = graft.operators.AnnIndexQueries.incrIndex(spark, sfDir)
    assert(idx.appendProofs.size ===
      graft.operators.AnnIndexQueries.NDeltas)
    idx.appendProofs.zipWithIndex.foreach { case ((before, after), i) =>
      assert(before.nonEmpty, s"append $i watched no existing files")
      assert(before === after,
        s"append $i modified existing layers (path/size/mtime drift)")
    }
    // Every delta layer exists and carries exactly its own id range.
    (0 until graft.operators.AnnIndexQueries.NDeltas).foreach { i =>
      val rows = spark.read.parquet(s"${idx.dir}/delta/d$i/vectors")
      val (lo, hi) = (idx.thresholds(i + 1), idx.thresholds(i + 2))
      val mm = rows.agg(min("vec_id"), max("vec_id")).head()
      assert(rows.count() > 0, s"delta d$i is empty")
      assert(mm.getLong(0) >= lo && mm.getLong(1) < hi,
        s"delta d$i ids [${mm.getLong(0)}, ${mm.getLong(1)}] outside " +
          s"its layer range [$lo, $hi)")
    }
  }

  test("incremental serves ≡ compact-index serves ≡ in-session twins") {
    assert(run("ann_index_query_incr").collect().toSeq ===
      run("ann_index_query").collect().toSeq)
    assert(run("ann_index_ivfpq_incr").collect().toSeq ===
      run("ann_index_ivfpq").collect().toSeq)
  }

  test("compacted manifest is byte-identical to the full rebuild's") {
    assert(run("ann_index_compact").collect().toSeq ===
      run("ann_index_build").collect().toSeq)
  }

  test("serving FROM the compacted tables equals every other serve") {
    // The post-compaction read path: once deltas are merged, the
    // serve tier reads the compacted tables alone — answers must
    // match the layered read and the full-index serve exactly.
    import graft.operators.AnnIndexQueries
    val idx = AnnIndexQueries.incrIndex(spark, sfDir)
    val lsh = AnnIndexQueries.lshServe(
      spark.read.parquet(s"${idx.dir}/compacted/vectors"))
    assert(lsh.collect().toSeq ===
      run("ann_index_query").collect().toSeq)
    val ivfpq = AnnIndexQueries.ivfpqServe(
      spark.read.parquet(s"${idx.dir}/compacted/vectors"),
      spark.read.parquet(s"${idx.dir}/ivf_centroids"),
      spark.read.parquet(s"${idx.dir}/compacted/ivf_assign"),
      spark.read.parquet(s"${idx.dir}/pq_codebook"),
      spark.read.parquet(s"${idx.dir}/compacted/pq_codes"))
    assert(ivfpq.collect().toSeq ===
      run("ann_index_ivfpq").collect().toSeq)
  }

  test("incremental serve plans scan only the incremental index") {
    for (name <- Seq("ann_index_query_incr", "ann_index_ivfpq_incr")) {
      val paths = scannedPaths(run(name))
      assert(paths.nonEmpty, s"$name: no file scans found")
      val offenders = paths.filterNot(_.contains("graft_ann_incr"))
      assert(offenders.isEmpty,
        s"$name reads outside the incremental index: $offenders")
    }
  }

  test("manifest pins every component's shape") {
    val rows = run("ann_index_build").collect()
    val byName = rows.map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = Tables.embeddings(spark, sfDir).count()
    assert(byName("lsh_vectors")._1 === 2 * n)   // NTables rows/vector
    assert(byName("ivf_assign")._1 === n)
    assert(byName("ivf_centroids")._1 === 8L)
    assert(byName("pq_codebook")._1 === 8L * 16) // M × Codes
    assert(byName("pq_codes")._1 === n * 8)      // M codes/vector
  }
}
