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

  test("append touches only delta files, never the base layer") {
    val idx = graft.operators.AnnIndexQueries.incrIndex(spark, sfDir)
    assert(idx.baseAtAppend.nonEmpty, "base layer has no files")
    assert(idx.baseAtAppend === idx.baseAfterAppend,
      "append modified base-layer files (path/size/mtime drift)")
    // The delta layer actually exists and carries the new batch.
    val deltaRows = spark.read
      .parquet(s"${idx.dir}/delta/vectors")
    assert(deltaRows.count() > 0, "delta layer is empty")
    import org.apache.spark.sql.functions.min
    val minVec = deltaRows.agg(min("vec_id")).head().getLong(0)
    assert(minVec >= idx.threshold,
      s"delta contains base vec_id $minVec < ${idx.threshold}")
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
