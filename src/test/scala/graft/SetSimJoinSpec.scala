package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Completeness proof for the prefix-filtered exact set-similarity
  * join: the PPJoin-style candidate filters (rarest-first prefix +
  * length bound) must lose NO qualifying pair — verified against a
  * brute-force all-pairs Jaccard over the same per-document shingle
  * sets. A lossy filter (wrong prefix length, wrong global order,
  * over-tight length bound) is exactly what this differential
  * catches; precision is already guaranteed by the query's exact
  * verification stage.
  */
class SetSimJoinSpec extends SparkTestBase {

  test("prefix-filtered join ≡ brute-force all-pairs at τ = 4/5") {
    val sets = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(TextFunctions.wordShingles(
          TextFunctions.tokens(col("text")), 3)).as("sh"))
      .select(col("doc_id"), TextFunctions.hash60(col("sh")).as("h"))
      .distinct()
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    val brute = (for {
      (a, sa) <- sets
      (b, sb) <- sets
      if a < b
      inter = (sa & sb).size
      union = sa.size + sb.size - inter
      if inter * 5 >= union * 4
    } yield (a, b, inter.toLong, union.toLong)).toSet

    val got = SparkEntry.queries("setsim_prefix_join")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("n_inter"), r.getAs[Long]("n_union")))
      .toSet

    assert(got == brute,
      s"missing=${(brute diff got).take(3)} extra=${(got diff brute).take(3)}")
    assert(brute.nonEmpty, "fixture must exercise qualifying pairs")
  }
}
