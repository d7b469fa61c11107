package graft

import org.apache.spark.sql.functions._
import graft.sources.{Page, PageParsers, Rankings}

/** S1–S3 through the DataSourceV2 connector: partition-per-URL scan,
  * permissive fetch failure, and equivalence with the non-connector
  * fixture path.
  */
class WebpageSourceSpec extends SparkTestBase {

  private def read(urls: Option[String] = None) = {
    val r = spark.read.format("graft.sources.WebpageDataSource")
    urls.fold(r)(u => r.option("urls", u)).load()
  }

  test("scan yields one row per URL with one partition per URL") {
    val df = read()
    assert(df.count() == 3)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.columns.toSeq == Seq("url", "html"))
  }

  test("S3 permissive: unknown URL logs and yields zero rows, query runs") {
    val df = read(Some(s"${PageParsers.ImdbUrl},https://nope.example/x"))
    assert(df.count() == 1)
  }

  test("V2 ingest ≡ fixture ingest (same parsed rankings)") {
    import spark.implicits._
    val viaV2 = read()
      .as[Page]
      .flatMap(PageParsers.parse _)
      .toDF()
      .orderBy("url", "rank", "title")
      .collect()
      .toSeq
    val direct = Rankings
      .rawRankings(spark)
      .orderBy("url", "rank", "title")
      .collect()
      .toSeq
    assert(viaV2 == direct)
    assert(viaV2.size == 32)
  }
}
