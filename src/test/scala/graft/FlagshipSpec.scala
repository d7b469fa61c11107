package graft

import org.apache.spark.sql.functions._
import graft.operators.{Canonical, FlagshipQueries}
import graft.sources.Rankings

/** Golden end-to-end + property tests for the flagship pipeline
  * (SURVEY.md §5.2 items 2 and 4).
  */
class FlagshipSpec extends SparkTestBase {

  test("golden: flagship top-10 by rank_sum with deterministic tiebreak") {
    val got = FlagshipQueries
      .flagship(spark)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    val want = Seq(
      ("the godfather", 3L),
      ("se7en", 9L),
      ("star wars episode iv a new hope", 9L), // tie: se7en < star wars
      ("raiders of the lost ark", 12L),
      ("the shawshank redemption", 12L),
      ("the dark knight", 16L), // NR → 0 wart: IMDB contributes rank 0
      ("schindlers list", 18L),
      ("12 angry men", 21L),
      ("double feature", 27L) // 3 rows from only 2 sources: Q6 wart
    )
    assert(got == want)
  }

  test("property: canonicalization is idempotent") {
    val df = Rankings
      .rawRankings(spark)
      .select(Canonical.canonicalizeTitle(col("title")).as("c1"))
      .select(
        col("c1"),
        Canonical.canonicalizeTitle(col("c1")).as("c2"))
    assert(df.filter(col("c1") =!= col("c2")).count() == 0)
  }

  test("property: every coverage survivor has exactly 3 rows") {
    val canon = Rankings
      .rawRankings(spark)
      .withColumn("title_comp", Canonical.canonicalizeTitle(col("title")))
    val covered = Canonical.fullCoverage(canon, 3, "title_comp")
    val counts =
      covered.groupBy("title_comp").count().filter(col("count") =!= 3)
    assert(counts.count() == 0)
  }

  test("property: rank_sum == rank_avg * 3 for survivors") {
    val rows = FlagshipQueries.flagship(spark).collect()
    rows.foreach { r =>
      assert(math.abs(r.getLong(1) - r.getDouble(2) * 3) < 1e-9)
    }
  }

  test("property: union conserves per-source row counts (10+11+11)") {
    val counts = Rankings
      .rawRankings(spark)
      .groupBy("url")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(counts(graft.sources.PageParsers.EmpireUrl) == 10L)
    assert(counts(graft.sources.PageParsers.RankerUrl) == 11L)
    assert(counts(graft.sources.PageParsers.ImdbUrl) == 11L)
  }

  test("plan: same result on local[1]-style single partition (determinism)") {
    val one = Rankings
      .rawRankings(spark)
      .coalesce(1)
      .withColumn("rank_int", Canonical.safeRank(col("rank")))
      .withColumn("title_comp", Canonical.canonicalizeTitle(col("title")))
    val covered = Canonical.fullCoverage(one, 3, "title_comp")
    val got = Canonical
      .rankReports(covered, "title_comp", "rank_int")
      .orderBy(col("rank_sum").asc, col("title_comp").asc)
      .limit(10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    val multi = FlagshipQueries
      .flagship(spark)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    assert(got == multi)
  }
}
