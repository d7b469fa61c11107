package graft.sources

import java.util

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `webpage` DataSourceV2 (S1–S3 in SURVEY.md §2a): schema
  * (url STRING, html STRING), ONE InputPartition PER URL — the
  * reference's one-async-task-per-URL fan-out (top_movies.py:117-125)
  * becomes plain Spark task parallelism, so N pages fetch/parse on N
  * executor cores with no coordination.
  *
  * Fetch-error tolerance mirrors the reference exactly
  * (top_movies.py:50-67): a failed FETCH logs and yields zero rows for
  * that partition (the query keeps running on the other sources);
  * parse errors downstream remain fail-fast. This environment is
  * zero-egress, so the "fetch" resolves recorded fixture pages from
  * the classpath; an unknown URL behaves like a fetch failure.
  *
  * Two fetch modes, selected by `option("mode", ...)`:
  *  - "fixture" (default): resolve recorded pages from the classpath —
  *    correct for this zero-egress environment and for reproducible
  *    tests.
  *  - "live": a real HTTP GET per URL via `java.net.http.HttpClient`,
  *    matching the reference's semantics (top_movies.py:30-40): 2xx →
  *    body decoded per the Content-Type charset; non-2xx or transport
  *    error → fetch failure (warn + zero rows, S3 tolerance). The
  *    client is ONE per executor JVM (the reference's shared session,
  *    top_movies.py:119) — never per row.
  *
  * Usage: spark.read.format("graft.sources.WebpageDataSource")
  *   [.option("urls", "u1,u2")][.option("mode", "live")].load()
  */
class WebpageDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WebpageDataSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WebpageTable(
      Option(properties.get("urls"))
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(WebpageDataSource.DefaultUrls), {
        val mode = Option(properties.get("mode")).getOrElse("fixture")
        // Reject typos loudly — "Live" silently serving fixture pages
        // would be stale data masquerading as a live fetch.
        require(
          mode == "fixture" || mode == "live",
          s"webpage source: mode must be 'fixture' or 'live', got '$mode'")
        mode
      })
}

object WebpageDataSource {
  val Schema: StructType = StructType(
    Seq(StructField("url", StringType), StructField("html", StringType)))

  /** The reference's three chart pages (top_movies.py:14-16). */
  val DefaultUrls: Seq[String] =
    Seq(PageParsers.ImdbUrl, PageParsers.RankerUrl, PageParsers.EmpireUrl)

  /** Content fetches actually performed (fixture reads + live GETs) —
    * test-visible so WebpagePushdownSpec can prove that pruned scans
    * skip them. local-mode only instrumentation (one JVM).
    */
  val contentFetches = new java.util.concurrent.atomic.AtomicLong

  private def resourceOf(url: String): Option[String] =
    if (url.contains("www.imdb.com")) Some("/pages/imdb.html")
    else if (url.contains("www.ranker.com")) Some("/pages/ranker.html")
    else if (url.contains("www.empireonline.com"))
      Some("/pages/empire.html")
    else None

  /** Pruned-projection existence probe: is there a recorded page for
    * the URL? No content bytes are read.
    */
  def exists(url: String): Boolean =
    resourceOf(url).exists(r => getClass.getResource(r) != null)

  /** Fixture-mode "fetch": resolve the recorded page for a URL.
    * None = fetch failure (unknown host / missing fixture).
    */
  def fetch(url: String): Option[String] = {
    resourceOf(url).flatMap { r =>
      Option(getClass.getResourceAsStream(r)).map { in =>
        contentFetches.incrementAndGet()
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      }
    }
  }

  /** Shared per-executor-JVM HTTP client — the reference keeps one
    * session for all fetches (top_movies.py:119); creating a client
    * per row/partition would exhaust sockets at fan-out scale.
    */
  lazy val httpClient: java.net.http.HttpClient =
    java.net.http.HttpClient
      .newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()

  /** Charset from a Content-Type header value; UTF-8 when the header
    * is absent, names no charset, or names an unknown one. This is the
    * reference's `response.text` decode rule (top_movies.py:39 —
    * aiohttp uses the declared charset first); the one divergence is
    * the silent-header fallback, where aiohttp may content-sniff via
    * chardet — a probabilistic guess we deliberately don't reproduce
    * (UTF-8 is the deterministic modern default).
    */
  def charsetOf(contentType: Option[String]): java.nio.charset.Charset =
    contentType
      .flatMap(ct =>
        "(?i)charset=\"?([^;\"\\s]+)".r
          .findFirstMatchIn(ct)
          .map(_.group(1)))
      .flatMap(n =>
        scala.util.Try(java.nio.charset.Charset.forName(n)).toOption)
      .getOrElse(java.nio.charset.StandardCharsets.UTF_8)

  /** Live-mode fetch: HTTP GET; 2xx → body bytes decoded per the
    * response's declared Content-Type charset ([[charsetOf]]);
    * anything else → None (fetch failure).
    */
  def fetchLive(url: String): Option[String] =
    try {
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(30))
        .GET()
        .build()
      val resp = httpClient.send(
        req, java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      if (resp.statusCode() / 100 == 2) {
        // Counted only on a delivered body, matching fixture-mode
        // semantics (a timeout/non-2xx is a FAILED fetch, not a
        // content fetch) — the instrument means the same thing in
        // both modes.
        contentFetches.incrementAndGet()
        Some(new String(
          resp.body(),
          charsetOf(
            Option(resp.headers().firstValue("Content-Type").orElse(null)))))
      } else None
    } catch { case scala.util.control.NonFatal(_) => None }
}

class WebpageTable(urls: Seq[String], mode: String)
    extends Table
    with SupportsRead
    with SupportsMetadataColumns {
  override def name(): String = "webpage"
  override def schema(): StructType = WebpageDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new WebpageScanBuilder(urls, mode)

  /** Hidden METADATA COLUMN (the `_metadata`-style provenance hook,
    * Kafka's partition/offset shape): `_partition_idx` is the row's
    * InputPartition ordinal in the TABLE's url list — stable under
    * filter pushdown (pruning skips partitions, it never renumbers
    * them), visible only when a query names it.
    */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(new MetadataColumn {
      override def name(): String = "_partition_idx"
      override def dataType(): DataType = IntegerType
      override def comment(): String =
        "ordinal of the row's InputPartition in the table's url list"
    })
}

/** ScanBuilder with REAL pushdown — the 100 TB story applied to a
  * fetch source, where pruning means entire network fetches never
  * happen:
  *
  *  - filter pushdown ([[SupportsPushDownFilters]]): `url = v` /
  *    `url IN (...)` predicates prune the PARTITION LIST at planning,
  *    so filtered-out pages are never fetched at all. Handled filters
  *    are still returned as residual (Spark re-evaluates them — safe
  *    double-filtering), and reported via `pushedFilters` so the plan
  *    shows the prune.
  *  - column pruning ([[SupportsPushDownRequiredColumns]]): when the
  *    query never reads `html` (url-only projections, count(*)), the
  *    fixture reader answers from an EXISTENCE check — content bytes
  *    are never read. Row semantics are identical (a row exists iff
  *    the fetch would have succeeded). Live mode still performs the
  *    GET: HTTP existence can't be probed without a request, and a
  *    HEAD's status is not contractually the GET's.
  */
class WebpageScanBuilder(urls: Seq[String], mode: String)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.sources.{EqualTo, Filter, In}

  private var pushed: Array[Filter] = Array.empty
  // Partition ordinals are assigned on the TABLE's url list ONCE,
  // then pruning filters the (url, ordinal) pairs directly —
  // provenance must not renumber, and pruning by pair (not by
  // re-deriving string membership in build()) keeps it O(n) and
  // makes each surviving partition exactly one pair even when the
  // table's url list contains duplicates.
  private var prunedPairs: Seq[(String, Int)] = urls.zipWithIndex
  private var required: StructType = WebpageDataSource.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val handled = filters.collect {
      case f @ EqualTo("url", v: String) => (f: Filter, Set(v))
      case f @ In("url", vs) if vs.forall(_.isInstanceOf[String]) =>
        (f: Filter, vs.map(_.asInstanceOf[String]).toSet)
    }
    pushed = handled.map(_._1)
    prunedPairs = handled.foldLeft(urls.zipWithIndex) {
      case (pairs, (_, keep)) => pairs.filter { case (u, _) => keep(u) }
    }
    // Everything stays residual: Spark re-applies the predicates on
    // the emitted rows, so the prune can only skip work, never
    // change results.
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new WebpageScan(prunedPairs, mode, required, pushed.map(_.toString))
}

class WebpageScan(
    urls: Seq[(String, Int)],
    mode: String,
    required: StructType,
    pushedDesc: Array[String])
    extends Scan
    with Batch
    with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    urls.map { case (u, i) =>
      WebpageInputPartition(u, i): InputPartition
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new WebpageReaderFactory(mode, required.fieldNames.toSeq)
  override def description(): String =
    s"webpage [urls=${urls.size}, " +
      s"PushedFilters: [${pushedDesc.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}]"

  /** V2 stats → planner: at most one row per (pruned) URL, sized at a
    * nominal page weight. Reporting the POST-prune cardinality means
    * joins against the source see a KB-scale relation and pick a
    * broadcast without hints — the stats path CBO uses for catalog
    * tables, working for a fetch connector (WebpageStatsSpec pins
    * the reported numbers and the hint-free broadcast).
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val NominalPageBytes = 4096L
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(urls.size.toLong * NominalPageBytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(urls.size.toLong)
  }
}

case class WebpageInputPartition(url: String, idx: Int)
    extends InputPartition

class WebpageReaderFactory(mode: String, fields: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WebpageInputPartition]
    new WebpageReader(p.url, p.idx, mode, fields)
  }
}

class WebpageReader(
    url: String, idx: Int, mode: String, fields: Seq[String])
    extends PartitionReader[InternalRow]
    with Logging {
  private var emitted = false
  private var current: InternalRow = _

  override def next(): Boolean =
    if (emitted) false
    else {
      emitted = true
      val needsHtml = fields.contains("html")
      // Pruned fixture read: existence check only — the content
      // bytes are never loaded (WebpagePushdownSpec counts this).
      val fetched: Option[Option[String]] =
        if (!needsHtml && mode == "fixture")
          if (WebpageDataSource.exists(url)) Some(None) else None
        else {
          val f =
            if (mode == "live") WebpageDataSource.fetchLive(url)
            else WebpageDataSource.fetch(url)
          f.map(Some(_))
        }
      fetched match {
        case Some(html) =>
          current = InternalRow(
            fields.map {
              case "url" => UTF8String.fromString(url)
              case "html" =>
                UTF8String.fromString(html.getOrElse(""))
              case "_partition_idx" => idx: java.lang.Integer
            }: _*)
          true
        case None =>
          // S3 permissive semantics: failed fetch → log + zero rows.
          logWarning(s"webpage fetch failed for $url; skipping source")
          false
      }
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
