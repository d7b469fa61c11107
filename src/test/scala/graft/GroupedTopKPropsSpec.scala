package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.plans.GroupedTopK

/** Randomized differential for the custom GroupedTopK physical
  * operator: on arbitrary data — duplicate sort values (tie storms),
  * skewed group sizes, k larger than groups, negative values — the
  * heap-based operator must produce exactly the window
  * `row_number ≤ k` rows. The example spec pins the plan shape; this
  * pins the semantics where heaps go wrong (tie-breaking, eviction
  * order, k ≥ group size). Fixed seeds, CanonicalPropsSpec pattern.
  */
class GroupedTopKPropsSpec extends SparkTestBase {

  private case class RowG(g: String, v: Long, id: Long)

  private def dataGen: Gen[(Seq[(String, Long, Long)], Int)] =
    for {
      nGroups <- Gen.chooseNum(1, 6)
      n <- Gen.chooseNum(1, 300)
      k <- Gen.chooseNum(1, 8)
      rows <- Gen.listOfN(
        n,
        for {
          // Skewed group pick: group 0 gets most rows.
          g <- Gen.frequency(
            5 -> Gen.const(0),
            2 -> Gen.chooseNum(0, nGroups - 1))
          // Tiny value domain → constant ties.
          v <- Gen.chooseNum(-5L, 5L)
        } yield (s"g$g", v))
    } yield (rows.zipWithIndex.map { case ((g, v), i) =>
      (g, v, i.toLong)
    }, k)

  test("random tie-heavy frames: custom operator ≡ window row_number") {
    import spark.implicits._
    val params = Gen.Parameters.default
    val cases = (0 until 8).flatMap(i =>
      dataGen.apply(params, Seed(4242L + i)).toSeq)
    assert(cases.size >= 6)
    cases.zipWithIndex.foreach { case ((rows, k), i) =>
      val src = rows.toDF("g", "v", "id")
      val custom = GroupedTopK
        .topK(src, Seq("g"), Seq(("v", true), ("id", false)), k)
      val w = Window.partitionBy("g")
        .orderBy(col("v").desc, col("id").asc)
      // GroupedTopK emits the per-group rank as a trailing column —
      // compare against the window form WITH its rnk kept.
      val windowed = src
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getLong(1), r.getLong(2))
      val got = custom.collect().sortBy(key).toSeq
      val want = windowed.collect().sortBy(key).toSeq
      assert(got == want,
        s"case #$i (n=${rows.size}, k=$k): " +
          s"custom=${got.size} rows, window=${want.size} rows, " +
          s"first diff=${got.zip(want).find(p => p._1 != p._2)}")
    }
  }
}
