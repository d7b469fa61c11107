package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape assertions for the TPC-H remainder — correctness is the
  * DuckDB gate's job; these pin the SCALE properties: the distinctive
  * join strategies actually chosen (semi/anti for EXISTS/NOT-EXISTS,
  * broadcasts for dimensions and one-row scalars), and the absence of
  * unbounded cartesian products anywhere in the 18 plans.
  */
class TpchPlanSpec extends SparkTestBase {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("EXISTS/NOT EXISTS run as semi/anti joins, never subquery re-execution") {
    assert(plan("tpch_q4").contains("LeftSemi"))
    val q21 = plan("tpch_q21")
    assert(q21.contains("LeftSemi"))
    assert(q21.contains("LeftAnti"))
  }

  test("no unbounded cartesian product in any TPC-H plan") {
    val names = SparkEntry.queries.keySet.filter(_.startsWith("tpch_q"))
    assert(names.size == 22, s"expected the full suite, got $names")
    names.foreach { n =>
      assert(!plan(n).contains("CartesianProduct"),
        s"$n plans a CartesianProduct")
    }
  }

  test("scalar-aggregate comparisons broadcast the one-row side") {
    // q11 (total DIV threshold), q15 (max revenue), q22 (positive
    // average): the scalar side must reach the fact side as a
    // broadcast, not a shuffle.
    Seq("tpch_q11", "tpch_q15", "tpch_q22").foreach { n =>
      assert(plan(n).contains("Broadcast"), s"$n never broadcasts")
    }
  }

  test("the selective date predicate pushes into the q6 parquet scan") {
    val p = plan("tpch_q6")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      "q6 scan does not push the shipdate filter")
  }
}
