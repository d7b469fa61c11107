package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Page, PageParsers}
import graft.streaming.StreamingEvents

/** Queries exercising the custom source and streaming surfaces:
  *   - the `webpage` DataSourceV2 (one InputPartition per URL,
  *     permissive fetch) feeding the same extraction flatMap;
  *   - the shared batch≡stream windowed aggregation, run in batch mode
  *     here (its streaming twin runs in StreamingSpec with an
  *     available-now trigger and must produce the identical result).
  */
object SourceQueries {

  private def webpages(s: SparkSession): DataFrame =
    s.read.format("graft.sources.WebpageDataSource").load()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // V2 scan shape: one row per successfully-fetched URL.
    "webpage_scan" -> ((s, _) =>
      webpages(s)
        .groupBy("url")
        .agg(count(lit(1)).as("n_pages"))
        .orderBy("url")),

    // Full ingest through the V2 source: identical output (and oracle)
    // to raw_rankings, which reads fixtures without the connector.
    "webpage_rankings" -> ((s, _) => {
      import s.implicits._
      webpages(s)
        .as[Page]
        .flatMap(PageParsers.parse _)
        .toDF()
        .orderBy(col("url"), col("rank"), col("title"))
    }),

    // The streaming pipeline's aggregation, batch-executed.
    "stream_window_batch" -> ((s, d) =>
      StreamingEvents
        .windowedAgg(graft.Tables.events(s, d))
        .orderBy("day", "event_type"))
  )

  val oracleSql: Map[String, String] = Map(
    "webpage_scan" ->
      s"""SELECT url, CAST(n AS BIGINT) AS n_pages FROM (VALUES
         |  ('${PageParsers.EmpireUrl}', 1),
         |  ('${PageParsers.ImdbUrl}', 1),
         |  ('${PageParsers.RankerUrl}', 1)) AS t(url, n)
         |ORDER BY url""".stripMargin,
    "webpage_rankings" ->
      FlagshipQueries.oracleSql("raw_rankings"),
    "stream_window_batch" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |       event_type,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM events GROUP BY day, event_type
        |ORDER BY day, event_type""".stripMargin
  )
}
