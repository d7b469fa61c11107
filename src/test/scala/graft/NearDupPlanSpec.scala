package graft

/** Scale-safety plan assertions for the near-dup candidate joins.
  *
  * The sizes/signature tables in `ngram_jaccard` and
  * `minhash_band_pairs` hold one row PER DOCUMENT — at 100 TB that is
  * billions of rows, so an unconditional `broadcast()` hint on them is
  * a guaranteed executor OOM. These specs prove no such hint exists:
  * with `autoBroadcastJoinThreshold = -1` the planner only ever emits
  * a BroadcastExchange when a hint forces it, so an exchange-free plan
  * under that setting means every candidate→attribute join shuffles on
  * its keys (stats-based broadcasting at small SF remains allowed in
  * normal runs — that is size-aware and safe).
  */
class NearDupPlanSpec extends SparkTestBase {

  private def assertNoForcedBroadcast(name: String): Unit = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(
        !plan.contains("BroadcastExchange"),
        s"$name must not broadcast a per-document table:\n$plan")
      assert(
        !plan.contains("BroadcastNestedLoopJoin") &&
          !plan.contains("CartesianProduct"),
        s"$name must join on keys, never all-pairs:\n$plan")
      // Still produces the pinned result shape under the forced
      // shuffle-join plan (values are pinned by the DuckDB oracle).
      assert(df.count() > 0, s"$name returned no rows")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("ngram_jaccard plans without forced broadcasts") {
    assertNoForcedBroadcast("ngram_jaccard")
  }

  test("minhash_band_pairs plans without forced broadcasts") {
    assertNoForcedBroadcast("minhash_band_pairs")
  }
}
