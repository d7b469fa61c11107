package graft

import org.apache.spark.sql.functions._
import graft.sources.{PageParsers, WebpageDataSource}

/** The V2 source's pushdown must SKIP WORK, not just reshape plans:
  * a pushed url predicate prunes the partition list (filtered-out
  * pages are never fetched), and a url-only projection answers from
  * existence checks (content bytes never read in fixture mode). The
  * `contentFetches` counter proves both — and the unpruned scan's
  * count pins the counter itself as live, so a broken instrument
  * can't fake a skip.
  */
class WebpagePushdownSpec extends SparkTestBase {

  private def pages = spark.read
    .format("graft.sources.WebpageDataSource")
    .load()

  private def fetchDelta(body: => Unit): Long = {
    val before = WebpageDataSource.contentFetches.get()
    body
    WebpageDataSource.contentFetches.get() - before
  }

  test("unpruned scan fetches every page (counter is live)") {
    val d = fetchDelta {
      assert(pages.select("url", "html").collect().length == 3)
    }
    assert(d == 3, s"expected 3 content fetches, saw $d")
  }

  test("pushed url filter prunes fetches to the matching page") {
    val d = fetchDelta {
      val rows = pages
        .where(col("url") === PageParsers.ImdbUrl)
        .select("url", "html")
        .collect()
      assert(rows.length == 1)
      assert(rows.head.getString(0) == PageParsers.ImdbUrl)
    }
    assert(d == 1, s"filtered scan must fetch ONE page, fetched $d")
  }

  test("url-only projection reads no content at all") {
    val d = fetchDelta {
      val urls = pages.select("url").collect().map(_.getString(0))
      assert(urls.sorted.toSeq ==
        Seq(PageParsers.EmpireUrl, PageParsers.ImdbUrl,
          PageParsers.RankerUrl).sorted)
    }
    assert(d == 0, s"pruned projection must fetch nothing, fetched $d")
  }

  test("count(*) over the source reads no content") {
    val d = fetchDelta {
      assert(pages.count() == 3)
    }
    assert(d == 0, s"count must fetch nothing, fetched $d")
  }

  test("the pushed filter is visible in the scan description") {
    val df = pages.where(col("url") === PageParsers.ImdbUrl)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"),
      s"scan description must advertise the prune:\n$plan")
  }
}
