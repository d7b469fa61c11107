package graft

import org.apache.spark.sql.functions._

/** The grid-bucketed radius join must be COMPLETE (cell size equals
  * the radius, so every in-radius pair differs by ≤1 cell per axis
  * and lands in exactly one (home, neighbor) cell combination) and
  * must never plan an all-pairs shape. The registered query's DuckDB
  * oracle is already the brute-force join (so completeness is pinned
  * cross-engine at sf0.01, where 500 real pairs exist); this spec
  * proves the same property inside Spark on a DENSE synthetic plane —
  * the sf0.001 fixture plane is too sparse to contain any in-radius
  * pair — including boundary-straddling and exactly-at-radius pairs,
  * and pins the no-duplicates claim (one emission per pair with no
  * dedup step in the builder).
  */
class SpatialGridJoinSpec extends SparkTestBase {

  test("grid join equals brute-force radius join, without duplicates") {
    import spark.implicits._
    // 400 points packed into a 60×60 plane: ~dozens of in-radius
    // pairs, many straddling cell boundaries. Deterministic mixing.
    val pts = (1L to 400L)
      .map(i => (i, (i * 2654435761L) % 60L, (i * 40503L) % 60L)) ++
      // Hand-placed exactly-at-radius pairs: one inside a cell
      // neighborhood (3-4-5 triangle) and one axis-aligned pair
      // straddling a cell boundary (x = 53 → cell 10, x = 58 →
      // cell 11) — the two edges the ≤ filter and the ±1
      // neighborhood must both get right.
      Seq((401L, 0L, 0L), (402L, 3L, 4L),
        (403L, 58L, 20L), (404L, 53L, 20L))
    val ptsDf = pts.toDF("id", "x", "y")
    val grid = operators.OpsQueries.gridPairs(ptsDf, 5L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(grid.length == grid.distinct.length,
      "one emission per pair — the single-combination claim failed")
    val brute = (for {
      (a, xa, ya) <- pts
      (b, xb, yb) <- pts
      if a < b
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= 25L
    } yield (a, b, d2)).toSet
    assert(brute.nonEmpty, "degenerate synthetic plane: no pairs")
    assert(brute.exists(_._3 == 25L),
      "want at least one exactly-at-radius pair to pin the ≤ edge")
    assert(grid.toSet == brute,
      s"grid candidates missed or invented pairs: " +
        s"extra=${(grid.toSet -- brute).take(3)} " +
        s"missing=${(brute -- grid.toSet).take(3)}")
  }

  test("spatial_grid_join plans no cartesian or nested-loop join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = SparkEntry.queries("spatial_grid_join")(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"spatial join must be key-equi on the cell:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
