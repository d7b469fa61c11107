package graft.sources

import scala.util.matching.Regex

/** A fetched page: the source tag (its URL) plus the raw HTML body. */
case class Page(url: String, html: String)

/** One extracted ranking row. `rank` stays a String at ingest — a
  * DELIBERATE DIVERGENCE from the reference, which casts every rank to
  * int at parse time (top_movies.py:78,86,104) and would therefore
  * crash on a non-numeric IMDB rank cell (e.g. "NR."). Deferring the
  * coercion to query time keeps ingest permissive; the query layer's
  * safe cast (Q1, top_movies.py:131) then maps such ranks to 0 — which
  * means they SORT FIRST under the ascending rank aggregates and drag a
  * title's sum/mean down. That →0 effect is the reference's own wart
  * (its `to_numeric(errors='coerce').fillna(0)` exists for exactly this
  * shape of dirty data) and is pinned by the `safe_cast` oracle query.
  */
case class RawRanking(url: String, rank: String, title: String)

/** Per-site extraction functions — the reference's parsers (S4/S6/S9 in
  * SURVEY.md §2a) re-expressed as pure `Page => Seq[RawRanking]`
  * functions, designed to run inside a Dataset `flatMap` so that
  * positional alignment (Ranker's rank↔name zip) always stays within a
  * single invocation and never depends on row order across partitions.
  *
  * The reference parses with BeautifulSoup; these fixtures-oriented
  * parsers use anchored regexes over the same structural shapes
  * (`<h2>` list, `meta itemprop` pairs, `td.titleColumn` cells) and
  * preserve every edge semantic, including the warts:
  *   - Empire fixed-width year strip `[:-7]` (top_movies.py:75) — a
  *     year-less title is corrupted (dropRight(7) of "Heat" → "").
  *   - Ranker drops the first two names (page-level metadata,
  *     top_movies.py:97) and zip-truncates trailing unmatched ranks
  *     (top_movies.py:98).
  *   - IMDB rank stays a string; `strip()[:-1]` drops the trailing dot
  *     (top_movies.py:102).
  */
object PageParsers extends org.apache.spark.internal.Logging {

  val ImdbUrl = "https://www.imdb.com/chart/top"
  val RankerUrl =
    "https://www.ranker.com/crowdranked-list/the-best-movies-of-all-time"
  val EmpireUrl = "https://www.empireonline.com/movies/features/best-movies/"

  val Urls: Set[String] = Set(ImdbUrl, RankerUrl, EmpireUrl)

  /** ^(.*)\s*\(\d{4}\)\s*$ — trailing-year strip (top_movies.py:27). */
  private val TrailYr: Regex = """^(.*)\s*\(\d{4}\)\s*$""".r

  private val H2: Regex = "(?s)<h2[^>]*>(.*?)</h2>".r
  // Attribute-order-insensitive meta matching: find every <meta ...>
  // tag, then pull itemprop/content out of the tag body separately —
  // mirrors BeautifulSoup's attribute lookup rather than assuming the
  // serialized order the fixtures happen to use.
  private val MetaTag: Regex = """<meta\b([^>]*)>""".r
  private val ItemProp: Regex = """itemprop\s*=\s*"([^"]*)"""".r
  private val ContentAttr: Regex = """content\s*=\s*"([^"]*)"""".r

  /** All (itemprop, content) pairs of <meta> tags, in document order. */
  private def metaPairs(html: String): Seq[(String, String)] =
    MetaTag.findAllMatchIn(html).toSeq.flatMap { m =>
      val attrs = m.group(1)
      for {
        prop <- ItemProp.findFirstMatchIn(attrs).map(_.group(1))
        content <- ContentAttr.findFirstMatchIn(attrs).map(_.group(1))
      } yield (prop, content)
    }
  private val TitleCell: Regex = "(?s)<td class=\"titleColumn\">(.*?)</td>".r
  private val Anchor: Regex = "(?s)<a[^>]*>(.*?)</a>".r

  /** Site dispatch by URL substring (top_movies.py:71,80,99). Unknown
    * hosts parse to zero rows (the reference would return None; the
    * engine's permissive equivalent is an empty extraction).
    */
  def parse(page: Page): Seq[RawRanking] = {
    val known = Urls.exists(u => page.url == u) ||
      Seq("www.empireonline.com", "www.ranker.com", "www.imdb.com")
        .exists(page.url.contains)
    val rows =
      if (page.url.contains("www.empireonline.com")) parseEmpire(page)
      else if (page.url.contains("www.ranker.com")) parseRanker(page)
      else if (page.url.contains("www.imdb.com")) parseImdb(page)
      else Seq.empty
    // A silent zero-row extraction from a KNOWN source is the failure
    // mode the reference could never observe — make it loggable
    // (runs executor-side inside the flatMap task).
    if (rows.isEmpty && known)
      logWarning(s"extraction produced 0 rows for known source ${page.url}")
    rows
  }

  /** Empire: each <h2> is "N. Title (YYYY)" — split on the first dot,
    * trim, drop the last 7 chars (" (YYYY)"), repair Seven → Se7en
    * (top_movies.py:71-79).
    */
  def parseEmpire(page: Page): Seq[RawRanking] =
    H2.findAllMatchIn(page.html).toSeq.map { m =>
      val Array(rank, rawTitle) = m.group(1).split("\\.", 2)
      val stripped = rawTitle.trim.dropRight(7)
      val title = if (stripped == "Seven") "Se7en" else stripped
      RawRanking(page.url, rank.trim.toInt.toString, title)
    }

  /** IMPROVED-mode Empire parser (SURVEY.md §7.4): regex year strip
    * instead of the reference's fixed-width `[:-7]`, so a year-less
    * title ("Heat") survives instead of being corrupted to "". The
    * fidelity parser above stays wart-exact; both are oracle-pinned.
    */
  def parseEmpireRegex(page: Page): Seq[RawRanking] =
    H2.findAllMatchIn(page.html).toSeq.map { m =>
      val Array(rank, rawTitle) = m.group(1).split("\\.", 2)
      val stripped = rawTitle.trim match {
        case TrailYr(t) => t.trim
        case other => other
      }
      val title = if (stripped == "Seven") "Se7en" else stripped
      RawRanking(page.url, rank.trim.toInt.toString, title)
    }

  /** Ranker: two independent scans (positions, names) zipped
    * positionally after dropping the first two names; trailing-year
    * regex strip and the two alias repairs are applied per name before
    * the drop, exactly as the reference's scan loop does
    * (top_movies.py:80-98). zip truncates to the shorter side.
    */
  def parseRanker(page: Page): Seq[RawRanking] = {
    val metas = metaPairs(page.html)
    val ranks = metas.collect { case ("position", c) => c.toInt }
    val names = metas
      .collect { case ("name", c) => c }
      .map {
        case TrailYr(t) => t.trim
        case "Star Wars" => "Star Wars: Episode IV — A New Hope"
        case "Indiana Jones and the Raiders of the Lost Ark" =>
          "Raiders of the Lost Ark"
        case other => other
      }
      .drop(2)
    ranks.zip(names).map { case (r, t) =>
      RawRanking(page.url, r.toString, t)
    }
  }

  /** IMDB: each td.titleColumn has leading text "N." (rank: strip both
    * ends then drop the trailing dot — stays a STRING) and a nested
    * anchor whose text is the title (right-strip only)
    * (top_movies.py:99-105).
    */
  def parseImdb(page: Page): Seq[RawRanking] =
    TitleCell.findAllMatchIn(page.html).toSeq.flatMap { m =>
      val cell = m.group(1)
      // A cell without an anchor is malformed: skip the row (permissive)
      // rather than failing the whole partition's flatMap task.
      val anchorAt = cell.indexOf("<a")
      if (anchorAt < 0) None
      else {
        val leading = cell.substring(0, anchorAt)
        val rank = leading.trim.dropRight(1)
        val title = Anchor
          .findFirstMatchIn(cell)
          .map(_.group(1))
          .getOrElse("")
          .replaceAll("\\s+$", "")
        Some(RawRanking(page.url, rank, title))
      }
    }

  /** Load the recorded fixture pages bundled on the classpath
    * (zero-egress stand-ins for the three live chart pages).
    */
  def fixturePages(): Seq[Page] = {
    def res(name: String): String = {
      val in = getClass.getResourceAsStream(s"/pages/$name")
      require(in != null, s"missing classpath fixture /pages/$name")
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    Seq(
      Page(ImdbUrl, res("imdb.html")),
      Page(RankerUrl, res("ranker.html")),
      Page(EmpireUrl, res("empire.html"))
    )
  }
}
