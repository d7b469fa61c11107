package graft

/** The integer-exact Lloyd round: every vector lands in exactly one
  * cluster, the clustering is non-degenerate on the fixture, and the
  * report is stable across runs (the DuckDB oracle pins the values —
  * this spec pins the shape).
  */
class KmeansRefineSpec extends SparkTestBase {

  test("one Lloyd round partitions the corpus into stable clusters") {
    val rows = SparkEntry
      .queries("kmeans_refine")(spark, sfDir)
      .collect()
    val total = rows.map(_.getAs[Long]("n_members")).sum
    assert(total == 500, s"members must partition the corpus: $total")
    assert(rows.length >= 2, "fixture should spread over several clusters")
    val again = SparkEntry
      .queries("kmeans_refine")(spark, sfDir)
      .collect()
      .map(_.toString)
      .toSeq
    assert(again == rows.map(_.toString).toSeq, "non-deterministic result")
  }
}
