package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.GroupedTopK

/** The custom grouped-top-K operator (logical node → strategy →
  * bounded-heap exec) must agree row-for-row with the window
  * row_number form, and its plan must contain NO sort — eliminating
  * the per-partition full sort is the operator's entire reason to
  * exist.
  */
class GroupedTopKSpec extends SparkTestBase {

  test("grouped top-k ≡ window row_number, with a sort-free plan") {
    val src = Tables
      .orders(spark, sfDir)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")

    val custom = GroupedTopK.topK(
      src,
      Seq("o_orderpriority"),
      Seq(("o_totalprice", true), ("o_orderkey", false)),
      3)

    val w = Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = src
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)

    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getInt(3))
    val got = custom.collect().sortBy(key).toSeq
    val expected = windowed.collect().sortBy(key).toSeq
    assert(got.nonEmpty)
    assert(got == expected)

    // SparkPlan.nodeName strips the "Exec" suffix in plan strings.
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"),
      s"expected the custom exec in:\n$plan")
    assert(!plan.contains("!GroupedTopK"),
      s"custom exec must declare its produced attributes:\n$plan")
    assert(!plan.contains("Sort "),
      s"grouped top-k must not sort its input:\n$plan")
    // The window form, by contrast, DOES sort every partition.
    val windowPlan = windowed.queryExecution.executedPlan.toString
    assert(windowPlan.contains("Sort "))
  }

  test("edge cases: k exceeds group size, ties broken deterministically") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0), // group a: 2 rows, k=3 → both ranked
      ("a", 2L, 20.0),
      ("b", 3L, 5.0), // group b: tie on value → id breaks it
      ("b", 4L, 5.0),
      ("b", 5L, 5.0),
      ("b", 6L, 7.0)
    ).toDF("k", "id", "v")
    val out = GroupedTopK
      .topK(df, Seq("k"), Seq(("v", true), ("id", false)), 3)
      .orderBy("k", "rnk")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
      .toSeq
    assert(out == Seq(
      ("a", 2L, 1), ("a", 1L, 2),
      ("b", 6L, 1), ("b", 3L, 2), ("b", 4L, 3)))
  }
}
