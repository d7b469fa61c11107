package graft

import org.apache.spark.sql.functions._

/** Direct unit coverage of graft.plans.Lineage beyond the
  * oracle-pinned `lineage_report` gate: the set-operation cases.
  *
  * A Union's output attributes reuse the FIRST child's ExprIds, so a
  * walker that only merges child maps silently reports branch-1
  * sources for every branch — the exact bug the round-12 Union case
  * fixed. Intersect/Except policy: the right child's same-position
  * column decides membership row-by-row, so both sides count as
  * sources (documented in Lineage.scala).
  */
class LineageSpec extends SparkTestBase {

  private def lineageOf(df: org.apache.spark.sql.DataFrame)
      : Map[String, Set[String]] =
    plans.Lineage.report(df)
      .collect()
      .map(r => r.getString(0) ->
        r.getString(1).split(",").filter(_.nonEmpty).toSet)
      .toMap

  test("union output unions sources across ALL branches") {
    val a = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("tag"),
        col("l_quantity").cast("long").as("v"))
    val b = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("tag"),
        col("o_custkey").as("v"))
    val m = lineageOf(a.unionByName(b))
    assert(m("tag") == Set("l_returnflag", "o_orderpriority"))
    assert(m("v") == Set("l_quantity", "o_custkey"))
  }

  test("union lineage survives downstream aggregation") {
    val a = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("tag"),
        col("l_quantity").cast("long").as("v"))
    val b = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("tag"),
        col("o_custkey").as("v"))
    val m = lineageOf(
      a.unionByName(b).groupBy("tag").agg(sum(col("v")).as("v_sum")))
    assert(m("tag") == Set("l_returnflag", "o_orderpriority"))
    assert(m("v_sum") == Set("l_quantity", "o_custkey"))
  }

  test("intersect and except attribute both sides as sources") {
    val a = Tables.lineitem(spark, sfDir).select(
      col("l_returnflag").as("k"))
    val b = Tables.orders(spark, sfDir).select(
      col("o_orderpriority").as("k"))
    val mi = lineageOf(a.intersect(b))
    val me = lineageOf(a.except(b))
    assert(mi("k") == Set("l_returnflag", "o_orderpriority"))
    assert(me("k") == Set("l_returnflag", "o_orderpriority"))
  }

  test("three-branch union keeps every branch's sources") {
    val a = Tables.lineitem(spark, sfDir).select(
      col("l_returnflag").as("s"))
    val b = Tables.orders(spark, sfDir).select(
      col("o_orderpriority").as("s"))
    val c = Tables.customer(spark, sfDir).select(
      col("c_mktsegment").as("s"))
    val m = lineageOf(a.unionByName(b).unionByName(c))
    assert(m("s") ==
      Set("l_returnflag", "o_orderpriority", "c_mktsegment"))
  }
}
