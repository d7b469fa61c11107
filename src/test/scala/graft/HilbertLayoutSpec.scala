package graft

import org.apache.spark.sql.functions._
import graft.operators.OpsQueries

/** Exhaustive proof of the Hilbert-curve properties the layout
  * queries sell, over the full 256×256 coordinate grid: the index is
  * a bijection onto [0, 2^16), consecutive indices are ALWAYS
  * spatially adjacent (Manhattan distance exactly 1 — the property
  * Morton lacks), and the resulting locality beats Morton's on the
  * same grid.
  */
class HilbertLayoutSpec extends SparkTestBase {

  test("hilbert8 is a bijection with unit-step adjacency; beats Morton") {
    import spark.implicits._
    val grid = spark.range(256L * 256L)
      .select(
        (col("id") % 256).cast("int").as("x"),
        (col("id") / 256).cast("int").as("y"))
    val idx = OpsQueries.withHilbert(grid, "x", "y", "h")
      .select("x", "y", "h")
      .collect()
      .map(r => (r.getLong(2), r.getInt(0), r.getInt(1)))
      .sortBy(_._1)
    // Bijection: 65536 distinct indices covering exactly [0, 65536).
    assert(idx.length == 65536)
    assert(idx.head._1 == 0L && idx.last._1 == 65535L)
    assert(idx.map(_._1).distinct.length == 65536)
    // Unit-step adjacency: every consecutive pair of curve indices is
    // at Manhattan distance EXACTLY 1.
    idx.sliding(2).foreach { case Array((d0, x0, y0), (d1, x1, y1)) =>
      assert(d1 == d0 + 1)
      val dist = math.abs(x1 - x0) + math.abs(y1 - y0)
      assert(dist == 1, s"step $d0→$d1: ($x0,$y0)→($x1,$y1) dist=$dist")
    }
  }

  test("native hilbert_index expression ≡ projection chain on the grid") {
    // Evaluated as two SEPARATE plans and compared driver-side: a
    // single combined plan inlines the 40-projection chain into the
    // comparison filter and the optimizer OOMs on the exponential
    // inlined expression — the precise failure mode the native
    // expression exists to avoid.
    graft.functions.HilbertIndexExpr.register(spark)
    def grid = spark.range(256L * 256L)
      .select(
        (col("id") % 256).cast("int").as("x"),
        (col("id") / 256).cast("int").as("y"))
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val chain = asMap(OpsQueries.withHilbert(grid, "x", "y", "h")
      .select("x", "y", "h").collect())
    val native = asMap(grid
      .withColumn("h", expr("hilbert_index(x, y)"))
      .select("x", "y", "h").collect())
    assert(chain.size == 65536 && native.size == 65536)
    assert(chain == native)
  }

  test("curve_locality query: hilbert mean strictly below morton's") {
    val rows = SparkEntry.queries("curve_locality")(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("curve") -> r.getAs[Long]("mean_x1000"))
      .toMap
    assert(rows.keySet == Set("hilbert", "morton"))
    assert(rows("hilbert") < rows("morton"),
      s"hilbert=${rows("hilbert")} morton=${rows("morton")}")
  }
}
