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
  *
  * Skew guard: blocks larger than [[BlockCap]] are dropped BEFORE pair
  * generation (count pass + semi join, same shape as the MinHash
  * `BucketCap`). Without it a hot prefix block of B values — think
  * every title starting "The " — contributes B²/2 within-block pairs,
  * a guaranteed straggler at scale. The trade-off is recall: pairs
  * inside an over-sized block are foregone, exactly as cross-block
  * pairs already are; a production caller would re-block hot prefixes
  * with a longer key rather than raise the cap.
  */
object Fuzzy {

  /** Max values per prefix block; larger blocks are skipped. */
  val BlockCap = 500

  /** Pairs (ta < tb, dist ≤ maxDist) among the distinct values of the
    * single column `t` of `values`, blocked by `blockLen`-char prefix;
    * blocks larger than [[BlockCap]] are dropped before pairing.
    */
  def blockedPairs(
      values: DataFrame,
      blockLen: Int,
      maxDist: Int): DataFrame = {
    val blocked = values
      .distinct()
      .withColumn("blk", substring(col("t"), 1, blockLen))
    // Count pass first (O(1) aggregation state per block), then a semi
    // join keeps only in-cap blocks — the pair join below can never see
    // an over-sized block, and no aggregation buffers a block's values.
    val keep = blocked
      .groupBy("blk")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= BlockCap)
      .select("blk")
    // A using-column join moves the key column first; re-select in
    // (t, blk) order so the positional toDF renames stay correct.
    val capped =
      blocked.join(keep, Seq("blk"), "left_semi").select("t", "blk")
    val a = capped.toDF("ta", "blk")
    val b = capped.toDF("tb", "blk")
    a.join(b, "blk")
      .filter(col("ta") < col("tb"))
      .withColumn("dist", levenshtein(col("ta"), col("tb")))
      .filter(col("dist") <= maxDist)
      .select("ta", "tb", "dist")
      .orderBy("ta", "tb")
  }

  /** DuckDB twin: `tCte` must define a CTE named `t` with a single
    * column `t` (the distinct values); the rest mirrors
    * [[blockedPairs]] exactly, including the block cap.
    */
  def blockedPairsSql(tCte: String, blockLen: Int, maxDist: Int): String =
    s"""$tCte,
       |bt AS (SELECT t, substring(t, 1, $blockLen) AS blk FROM t),
       |keep AS (SELECT blk FROM bt GROUP BY blk HAVING count(*) <= $BlockCap),
       |btc AS (SELECT * FROM bt WHERE blk IN (SELECT blk FROM keep))
       |SELECT a.t AS ta, b.t AS tb,
       |       CAST(levenshtein(a.t, b.t) AS INTEGER) AS dist
       |FROM btc a JOIN btc b ON a.blk = b.blk AND a.t < b.t
       |WHERE levenshtein(a.t, b.t) <= $maxDist
       |ORDER BY ta, tb""".stripMargin
}
