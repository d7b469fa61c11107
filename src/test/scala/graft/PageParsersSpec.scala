package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Page, PageParsers, RawRanking}

/** Pins the S4–S9 extraction semantics (SURVEY.md §2a) against the
  * recorded fixtures, including every wart the reference exhibits
  * (top_movies.py:71-105).
  */
class PageParsersSpec extends AnyFunSuite {

  private val pages =
    PageParsers.fixturePages().map(p => p.url -> p).toMap
  private val empire = pages(PageParsers.EmpireUrl)
  private val ranker = pages(PageParsers.RankerUrl)
  private val imdb = pages(PageParsers.ImdbUrl)

  test("S4: Empire h2 split + fixed-width year strip") {
    val rows = PageParsers.parseEmpire(empire)
    assert(rows.head == RawRanking(PageParsers.EmpireUrl, "1", "The Godfather"))
    assert(rows.size == 10)
  }

  test("S4 wart: year-less 'Heat' is corrupted to empty by [:-7]") {
    val rows = PageParsers.parseEmpire(empire)
    assert(rows.last == RawRanking(PageParsers.EmpireUrl, "10", ""))
  }

  test("S5: Seven → Se7en repair (Empire)") {
    val rows = PageParsers.parseEmpire(empire)
    assert(rows(1).title == "Se7en")
  }

  test("S6: Ranker drops first two names (page metadata)") {
    val rows = PageParsers.parseRanker(ranker)
    assert(!rows.exists(_.title.contains("Best Movies of All Time")))
    assert(!rows.exists(_.title.contains("Ranker Crowd Lists")))
    assert(rows.head.title == "The Godfather")
  }

  test("S6 wart: zip truncation silently drops trailing unmatched ranks") {
    val rows = PageParsers.parseRanker(ranker)
    // 12 positions, 13 names − 2 dropped = 11 → rank 12 has no partner.
    assert(rows.size == 11)
    assert(rows.map(_.rank.toInt).max == 11)
  }

  test("S7: trailing-year regex strip (Ranker)") {
    val rows = PageParsers.parseRanker(ranker)
    assert(rows.head.title == "The Godfather") // from "The Godfather (1972)"
  }

  test("S8: Ranker alias repairs") {
    val titles = PageParsers.parseRanker(ranker).map(_.title)
    assert(titles.contains("Star Wars: Episode IV — A New Hope"))
    assert(titles.contains("Raiders of the Lost Ark"))
    assert(!titles.contains("Star Wars"))
    assert(!titles.contains("Indiana Jones and the Raiders of the Lost Ark"))
  }

  test("S9: IMDB rank stays a string, trailing dot dropped, title rstripped") {
    val rows = PageParsers.parseImdb(imdb)
    assert(rows.head == RawRanking(PageParsers.ImdbUrl, "1", "The Godfather"))
    assert(rows(1).title == "The Shawshank Redemption") // rstrip of trailing ws
    assert(rows.exists(r => r.rank == "NR" && r.title == "The Dark Knight"))
    assert(rows.exists(r => r.rank == "X" && r.title == "Bad Rank Movie"))
  }

  test("dispatch: unknown host extracts zero rows (permissive S3)") {
    assert(PageParsers.parse(Page("https://nowhere.example/", "<h2>1. X (2000)</h2>")).isEmpty)
  }

  test("robustness: h2 with attributes and reordered meta attrs still parse") {
    val e = Page(PageParsers.EmpireUrl, """<h2 class="x">1. A Movie (2001)</h2>""")
    assert(PageParsers.parseEmpire(e) ==
      Seq(RawRanking(PageParsers.EmpireUrl, "1", "A Movie")))
    val r = Page(
      PageParsers.RankerUrl,
      """<meta itemprop="name" content="m1"><meta itemprop="name" content="m2">
        |<meta content="First (1999)" itemprop="name">
        |<meta itemprop="position" content="1">""".stripMargin)
    assert(PageParsers.parseRanker(r) ==
      Seq(RawRanking(PageParsers.RankerUrl, "1", "First")))
  }

  test("robustness: titleColumn cell without an anchor is skipped, not fatal") {
    val p = Page(
      PageParsers.ImdbUrl,
      """<td class="titleColumn"> 1. </td>
        |<td class="titleColumn"> 2. <a href="/t">Ok</a></td>""".stripMargin)
    assert(PageParsers.parseImdb(p) ==
      Seq(RawRanking(PageParsers.ImdbUrl, "2", "Ok")))
  }
}
