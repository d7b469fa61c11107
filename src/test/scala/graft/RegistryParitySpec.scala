package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry invariants the correctness gate depends on: every
  * registered query carries oracle SQL (a missing oracle silently
  * downgrades that query to a weaker rows-only check in the driver),
  * no oracle is orphaned, and nothing is empty.
  */
class RegistryParitySpec extends AnyFunSuite {

  test("every query has an oracle and no oracle is orphaned") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert((oracles -- queries).isEmpty,
      s"oracles without queries: ${(oracles -- queries).toSeq.sorted}")
    assert((queries -- oracles).isEmpty,
      s"queries without oracles: ${(queries -- oracles).toSeq.sorted}")
  }

  test("no empty oracle SQL and no blank query names") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(name.trim.nonEmpty && name == name.trim)
      assert(sql.trim.nonEmpty, s"empty oracle for $name")
    }
  }
}
