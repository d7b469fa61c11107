package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked Levenshtein pair generation — the entity-resolution shape
  * shared by `fuzzy_match` (part names) and `title_fuzzy` (canonical
  * titles). Blocking on a fixed-length prefix turns pair generation
  * into a key-equi shuffle join (within-block pairs only — the
  * standard ER trade-off that avoids all-pairs at scale); one Spark
  * implementation and one oracle-SQL template keep the two call sites
  * from drifting.
  */
object Fuzzy {

  /** Pairs (ta < tb, dist ≤ maxDist) among the distinct values of the
    * single column `t` of `values`, blocked by `blockLen`-char prefix.
    */
  def blockedPairs(
      values: DataFrame,
      blockLen: Int,
      maxDist: Int): DataFrame = {
    val blocked = values
      .distinct()
      .withColumn("blk", substring(col("t"), 1, blockLen))
    val a = blocked.toDF("ta", "blk")
    val b = blocked.toDF("tb", "blk")
    a.join(b, "blk")
      .filter(col("ta") < col("tb"))
      .withColumn("dist", levenshtein(col("ta"), col("tb")))
      .filter(col("dist") <= maxDist)
      .select("ta", "tb", "dist")
      .orderBy("ta", "tb")
  }

  /** DuckDB twin: `tCte` must define a CTE named `t` with a single
    * column `t` (the distinct values); the rest mirrors
    * [[blockedPairs]] exactly.
    */
  def blockedPairsSql(tCte: String, blockLen: Int, maxDist: Int): String =
    s"""$tCte,
       |bt AS (SELECT t, substring(t, 1, $blockLen) AS blk FROM t)
       |SELECT a.t AS ta, b.t AS tb,
       |       CAST(levenshtein(a.t, b.t) AS INTEGER) AS dist
       |FROM bt a JOIN bt b ON a.blk = b.blk AND a.t < b.t
       |WHERE levenshtein(a.t, b.t) <= $maxDist
       |ORDER BY ta, tb""".stripMargin
}
