package graft

import org.apache.spark.sql.functions._

/** The SQL-scripting threshold search must land on the MINIMAL rung
  * of the power-of-two ladder: at the landing cutoff at most 400
  * customers remain, and at the previous rung more than 400 did —
  * i.e. the WHILE loop stopped exactly when its condition first
  * flipped, neither a step early nor a step late.
  */
class SqlScriptingSpec extends SparkTestBase {

  test("scripted threshold search lands on the minimal ladder rung") {
    val r = SparkEntry.queries("sql_scripting")(spark, sfDir)
      .collect().head
    val cutoff = r.getAs[Long]("cutoff")
    assert(cutoff >= 100000L &&
      java.lang.Long.bitCount(cutoff / 100000L) == 1 &&
      cutoff % 100000L == 0L,
      s"cutoff $cutoff is not on the 100000*2^k ladder")
    def countAbove(c: Long): Long =
      Tables.customer(spark, sfDir)
        .filter(expr(s"CAST(round(c_acctbal*100) AS BIGINT) > $c"))
        .count()
    assert(countAbove(cutoff) == r.getAs[Long]("n_above"))
    assert(r.getAs[Long]("n_above") <= 400L,
      "loop exited while its condition still held")
    if (cutoff > 100000L)
      assert(countAbove(cutoff / 2) > 400L,
        "loop overshot: the previous rung already qualified")
  }
}
