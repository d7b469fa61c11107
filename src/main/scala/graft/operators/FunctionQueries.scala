package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.Tables._

/** Scalar function families (SURVEY.md §2b rows: string, date/time,
  * math, array/map/JSON, casts, conditionals) — all built-in Catalyst
  * expressions, no UDFs, so every query stays inside whole-stage
  * codegen and survives column pruning / predicate pushdown.
  *
  * Determinism conventions as in RelationalQueries: integer or string
  * outputs, except where a double is bit-deterministic (sqrt of a
  * stored value, single division of exact integers).
  */
object FunctionQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // String function family over the part dimension.
    "str_functions" -> ((s, d) =>
      part(s, d)
        .filter(col("p_partkey") <= 50)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          replace(col("p_name"), lit("a"), lit("@")).as("name_repl"),
          lpad(col("p_brand"), 12, "_").as("brand_padded"),
          split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
          instr(col("p_name"), "e").as("first_e"))
        .orderBy("p_partkey")),

    // Regex family: extract + filter + count.
    "regex_functions" -> ((s, d) =>
      part(s, d)
        .withColumn("type_token",
          regexp_extract(col("p_type"), "^([A-Za-z]+)", 1))
        .filter(col("p_name").rlike("[aeiou]{2}"))
        .groupBy("type_token")
        .agg(count(lit(1)).as("n_parts"))
        .orderBy("type_token")),

    // Date/time extraction family over order dates.
    "date_functions" -> ((s, d) =>
      orders(s, d)
        .groupBy(
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"))
        .agg(
          count(lit(1)).as("n_orders"),
          min(dayofmonth(col("o_orderdate"))).as("min_dom"),
          max(month(col("o_orderdate"))).as("max_month"))
        .orderBy("yr", "qtr")),

    // date_trunc to day over the ns-precision events stream table.
    "date_trunc_events" -> ((s, d) =>
      events(s, d)
        .groupBy(
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
            .as("day"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(Money.cents(col("value"))).as("value_cents"))
        .orderBy("day")),

    // URL parsing — the domain-extraction step per-domain crawl
    // quotas and source reputation key on: deterministic URLs
    // constructed from document fields, dissected back with Spark's
    // parse_url (HOST / PATH / keyed QUERY). The oracle derives the
    // same components from the source fields directly, so parse_url's
    // spec compliance on well-formed URLs is the thing under test.
    "url_parse" -> ((s, d) =>
      documents(s, d)
        .withColumn("url",
          concat(lit("https://"), col("source"),
            lit(".example.com/docs/"), col("doc_id"),
            lit("?lang="), col("lang")))
        .select(
          col("doc_id"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'lang')").as("q_lang"))
        .orderBy("doc_id")),

    // JSON extraction (typed from_json on the Spark side) over
    // events.props.
    "json_extract" -> ((s, d) =>
      events(s, d)
        .withColumn("k",
          from_json(col("props"), lit("k INT")).getField("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("k").cast("long")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")),

    // Math family: integral/IEEE-exact ops only (sqrt is correctly
    // rounded by IEEE-754, so its bits match across engines).
    "math_functions" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_orderkey") <= 100)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          (col("l_orderkey") % 7).as("key_mod7"),
          abs(col("l_quantity") * -1).cast("long").as("qty_abs"),
          ceil(col("l_extendedprice") / 100.0).as("price_ceil_h"),
          floor(col("l_extendedprice") / 100.0).cast("long")
            .as("price_floor_h"),
          sqrt(col("l_quantity")).as("qty_sqrt"),
          expr("shiftleft(1, l_linenumber)").as("two_pow_line"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Array / higher-order functions over the embedding vectors —
    // lambda expressions evaluate inside codegen, no UDF.
    "array_functions" -> ((s, d) =>
      embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).as("n_dims"),
          size(filter(col("embedding"), x => x > 0)).as("n_pos"),
          size(filter(col("embedding"), x => x < 0)).as("n_neg"),
          element_at(col("embedding"), 1).as("first_val"),
          col("label"))
        .orderBy("vec_id")),

    // Higher-order functions over arrays — exists/forall predicates,
    // aggregate() folds (left-to-right double sums, the engine's
    // deterministic-fold convention), zip_with against the reversed
    // array, and a slice fold. All codegen expression work inside the
    // scan projection — no shuffle beyond the output sort, zero UDFs.
    "hof_functions" -> ((s, d) =>
      embeddings(s, d)
        .select(
          col("vec_id"),
          exists(col("embedding"), x => x > lit(0.9d)).as("has_big"),
          forall(col("embedding"), x => abs(x) <= lit(1.0d))
            .as("unit_range"),
          aggregate(col("embedding"), lit(0.0d), (acc, x) => acc + x)
            .as("sum_val"),
          aggregate(
            zip_with(col("embedding"), reverse(col("embedding")),
              (a, b) => a * b),
            lit(0.0d), (acc, x) => acc + x).as("palindrome_dot"),
          aggregate(slice(col("embedding"), 1, 4), lit(0.0d),
            (acc, x) => acc + x).as("first4_sum"))
        .orderBy("vec_id")),

    // posexplode: one row per vector component (bounded to 3 vectors).
    "array_explode" -> ((s, d) =>
      embeddings(s, d)
        .filter(col("vec_id") < 3)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(
          col("vec_id"),
          col("pos"),
          col("col").as("val"))
        .orderBy("vec_id", "pos")),

    // Conditional bucketing (CASE WHEN chain).
    "case_when" -> ((s, d) =>
      orders(s, d)
        .withColumn(
          "price_tier",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large"))
        .groupBy("price_tier")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("price_tier")),

    // NULL handling: nullif / coalesce round-trip.
    "null_handling" -> ((s, d) =>
      orders(s, d)
        .withColumn("status_or_null",
          when(col("o_orderstatus") === "F", lit(null))
            .otherwise(col("o_orderstatus")))
        .groupBy("status_or_null")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("status_or_null")).as("n_nonnull"))
        .orderBy(col("status_or_null").asc_nulls_first)),

    // try_cast family: safe casts that would throw under ANSI.
    // spread: every o_orderstatus row takes try_cast's FAILURE path
    // (a caught NumberFormatException per row); on the single-row-
    // group fixture that cost is serial — measured 1.26→0.70 s spread
    // across cores.
    "cast_try" -> ((s, d) =>
      graft.Tables.spread(orders(s, d))
        .select(
          substring(col("o_orderpriority"), 1, 1)
            .try_cast("int")
            .as("prio_num"),
          col("o_orderstatus").try_cast("int").as("status_num"))
        .groupBy("prio_num", "status_num")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("prio_num").asc_nulls_first,
          col("status_num").asc_nulls_first)),

    // Manual pivot: conditional aggregation into wide columns.
    "pivot_manual" -> ((s, d) =>
      orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT", 1L)
            .otherwise(0L)).as("n_urgent"),
          sum(when(col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
            .as("n_high"),
          sum(when(
            !col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("n_other"))
        .orderBy("yr")),

    // The native relational pivot: same reshape as pivot_manual but
    // through Dataset.pivot with EXPLICIT pivot values — no discovery
    // scan (the implicit form first collects distinct keys to the
    // driver, an extra pass a 100 TB pipeline never wants), and the
    // plan is the same single conditional aggregation.
    "pivot_native" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(Money.cents(col("l_extendedprice"))))
        .withColumnRenamed("F", "f_cents")
        .withColumnRenamed("O", "o_cents")
        .orderBy("flag")),

    // The inverse reshape: wide metric columns melted to long form via
    // the native unpivot operator (plans as Expand — one pass, no
    // shuffle beyond the source aggregate).
    "unpivot_metrics" -> ((s, d) =>
      orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(Money.cents(col("o_totalprice")))
            .as("total_cents"))
        .unpivot(
          Array(col("o_orderpriority")),
          Array(col("n_orders"), col("total_cents")),
          "metric",
          "value")
        .orderBy("o_orderpriority", "metric")),

    // Spark 4.0's native DataFrame TRANSPOSE — the third reshape
    // beside pivot (long→wide by key) and unpivot (wide→long):
    // rows↔columns wholesale, index values become column NAMES and
    // former column names land in `key`. Correct use is exactly this
    // shape — a small aggregate report flipped for presentation
    // (transpose materializes the index on the driver, so it is a
    // REPORT operator, never a data-scale one; the upstream aggregate
    // is where the distributed work happens). All metrics are long so
    // the transposed value columns share one type; event_type values
    // are fixture-stable identifiers, so the column set is
    // deterministic and the oracle can name them literally.
    "transpose_metrics" -> ((s, d) =>
      events(s, d)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum(Money.cents(col("value"))).as("cents"),
          countDistinct(col("user_id")).as("n_users"))
        .transpose()
        .orderBy("key")),

    // Spark 4.1's native APPROX_TOP_K — the space-saving heavy-hitter
    // sketch as a one-call SQL surface (the packaged sibling of the
    // hand-built Misra-Gries gate). Gated in its PROVABLE regime,
    // the sketch-suite discipline: maxItemsTracked (100) far exceeds
    // the column's distinct count, where the sketch is contractually
    // exact, so item+count hash-pin against the exact GROUP BY twin;
    // k exceeds the distinct count too, so no tie-at-the-cutoff can
    // make selection ambiguous. At 100 TB the same one-liner rolls up
    // mergeable per-partition sketches instead of shuffling raw rows.
    "approx_top_k_events" -> ((s, d) =>
      events(s, d)
        .agg(expr("approx_top_k(event_type, 10, 100)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(
          col("e.item").as("item"),
          col("e.count").cast("long").as("cnt"))
        .orderBy(col("cnt").desc, col("item"))),

    // Spark 4 COLLATION-aware comparison — a case-insensitive
    // equi-JOIN keyed on COLLATE UTF8_LCASE, no lower() rewrite on
    // the join key: the fact side's event_type is case-mangled by row
    // parity, the dim side is lowercase, and the collated equality
    // still plans as a key-equi SortMergeJoin (collated strings don't
    // support binary equality, so Spark declines hash joins and
    // sort-merges on the collation order instead — still a scalable
    // shuffle-on-key plan, never a nested loop; a pre-collation
    // engine needs the lower() normalization the oracle spells out).
    // Group keys come from the lowercase dim side, so output values
    // are deterministic.
    "collated_join" -> ((s, d) => {
      val fact = events(s, d)
        .select(
          when(col("event_id") % 2 === 0, upper(col("event_type")))
            .otherwise(col("event_type")).as("etype_mixed"),
          col("value"))
      val dim = events(s, d)
        .select(lower(col("event_type")).as("etype"))
        .distinct()
      fact
        .join(dim,
          expr("collate(etype_mixed, 'UTF8_LCASE') = " +
            "collate(etype, 'UTF8_LCASE')"))
        .groupBy("etype")
        .agg(
          count(lit(1)).as("n"),
          sum(Money.cents(col("value"))).as("cents"))
        .orderBy("etype")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "str_functions" ->
      """SELECT p_partkey,
        |       upper(p_name) AS name_upper,
        |       CAST(length(p_name) AS INTEGER) AS name_len,
        |       substring(p_name, 1, 8) AS name_prefix,
        |       concat_ws('|', p_brand, p_type) AS brand_type,
        |       replace(p_name, 'a', '@') AS name_repl,
        |       lpad(p_brand, 12, '_') AS brand_padded,
        |       split_part(p_type, ' ', 1) AS type_head,
        |       CAST(strpos(p_name, 'e') AS INTEGER) AS first_e
        |FROM part WHERE p_partkey <= 50 ORDER BY p_partkey""".stripMargin,
    "regex_functions" ->
      """SELECT regexp_extract(p_type, '^([A-Za-z]+)', 1) AS type_token,
        |       count(*) AS n_parts
        |FROM part WHERE regexp_matches(p_name, '[aeiou]{2}')
        |GROUP BY type_token ORDER BY type_token""".stripMargin,
    "date_functions" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |       count(*) AS n_orders,
        |       CAST(min(dayofmonth(o_orderdate)) AS INTEGER) AS min_dom,
        |       CAST(max(month(o_orderdate)) AS INTEGER) AS max_month
        |FROM orders GROUP BY yr, qtr ORDER BY yr, qtr""".stripMargin,
    "date_trunc_events" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM events GROUP BY day ORDER BY day""".stripMargin,
    "url_parse" ->
      """SELECT doc_id, source || '.example.com' AS host,
        |       '/docs/' || doc_id AS path, lang AS q_lang
        |FROM documents ORDER BY doc_id""".stripMargin,
    "json_extract" ->
      """SELECT event_type,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
        |         AS BIGINT) AS sum_k,
        |       CAST(min(CAST(json_extract_string(props, '$.k') AS INTEGER))
        |         AS INTEGER) AS min_k,
        |       CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER))
        |         AS INTEGER) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "math_functions" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_orderkey % 7 AS key_mod7,
        |       CAST(abs(l_quantity * -1) AS BIGINT) AS qty_abs,
        |       CAST(ceil(l_extendedprice / 100.0) AS BIGINT)
        |         AS price_ceil_h,
        |       CAST(floor(l_extendedprice / 100.0) AS BIGINT)
        |         AS price_floor_h,
        |       sqrt(l_quantity) AS qty_sqrt,
        |       CAST(1 << l_linenumber AS INTEGER) AS two_pow_line
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "array_functions" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS INTEGER) AS n_dims,
        |       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER)
        |         AS n_pos,
        |       CAST(len(list_filter(embedding, x -> x < 0)) AS INTEGER)
        |         AS n_neg,
        |       embedding[1] AS first_val,
        |       label
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    // Fold-order exactness: Spark's aggregate() HOF adds elements
    // LEFT-TO-RIGHT from a 0.0 double seed; a plain SQL sum() has no
    // guaranteed accumulation order for IEEE doubles, so the oracle
    // folds with list_reduce over a 0.0-prepended list — bit-identical
    // sequential semantics on both engines (and, unlike an
    // unnest+join form, it keeps rows whose array is empty).
    "hof_functions" ->
      """SELECT vec_id,
        |       len(list_filter(embedding, x -> x > 0.9)) > 0 AS has_big,
        |       len(list_filter(embedding, x -> abs(x) <= 1.0))
        |         = len(embedding) AS unit_range,
        |       list_reduce(list_prepend(0.0::DOUBLE, embedding),
        |         (acc, x) -> acc + x) AS sum_val,
        |       list_reduce(list_prepend(0.0::DOUBLE,
        |         list_transform(generate_series(1, len(embedding)),
        |           i -> embedding[i] * embedding[len(embedding) + 1 - i])),
        |         (acc, x) -> acc + x) AS palindrome_dot,
        |       list_reduce(list_prepend(0.0::DOUBLE, embedding[1:4]),
        |         (acc, x) -> acc + x) AS first4_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "array_explode" ->
      """SELECT vec_id, CAST(p AS INTEGER) AS pos, val FROM (
        |  SELECT vec_id,
        |         unnest(generate_series(0, len(embedding)-1)) AS p,
        |         unnest(embedding) AS val
        |  FROM embeddings WHERE vec_id < 3) t
        |ORDER BY vec_id, pos""".stripMargin,
    "case_when" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 150000 THEN 'medium'
        |            ELSE 'large' END AS price_tier,
        |       count(*) AS n_orders
        |FROM orders GROUP BY price_tier ORDER BY price_tier""".stripMargin,
    "null_handling" ->
      """SELECT nullif(o_orderstatus, 'F') AS status_or_null,
        |       count(*) AS n_rows,
        |       count(nullif(o_orderstatus, 'F')) AS n_nonnull
        |FROM orders GROUP BY status_or_null
        |ORDER BY status_or_null ASC NULLS FIRST""".stripMargin,
    "cast_try" ->
      """SELECT try_cast(substring(o_orderpriority, 1, 1) AS INTEGER)
        |         AS prio_num,
        |       try_cast(o_orderstatus AS INTEGER) AS status_num,
        |       count(*) AS n
        |FROM orders GROUP BY prio_num, status_num
        |ORDER BY prio_num ASC NULLS FIRST, status_num ASC NULLS FIRST"""
        .stripMargin,
    "pivot_manual" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1
        |         ELSE 0 END) AS BIGINT) AS n_urgent,
        |       CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1
        |         ELSE 0 END) AS BIGINT) AS n_high,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN
        |         ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_other
        |FROM orders GROUP BY yr ORDER BY yr""".stripMargin,
    "pivot_native" ->
      """SELECT l_returnflag AS flag,
        |       CAST(sum(CASE WHEN l_linestatus = 'F'
        |         THEN CAST(round(l_extendedprice*100) AS BIGINT) END)
        |         AS BIGINT) AS f_cents,
        |       CAST(sum(CASE WHEN l_linestatus = 'O'
        |         THEN CAST(round(l_extendedprice*100) AS BIGINT) END)
        |         AS BIGINT) AS o_cents
        |FROM lineitem GROUP BY flag ORDER BY flag""".stripMargin,
    "unpivot_metrics" ->
      """WITH wide AS (
        |  SELECT o_orderpriority,
        |         count(*) AS n_orders,
        |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |           AS BIGINT) AS total_cents
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'n_orders' AS metric,
        |       n_orders AS value FROM wide
        |UNION ALL
        |SELECT o_orderpriority, 'total_cents' AS metric,
        |       total_cents AS value FROM wide
        |ORDER BY o_orderpriority, metric""".stripMargin,
    "approx_top_k_events" ->
      """SELECT event_type AS item, count(*) AS cnt
        |FROM events GROUP BY 1
        |ORDER BY cnt DESC, item""".stripMargin,
    "transpose_metrics" ->
      """WITH m AS (
        |  SELECT event_type,
        |         CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(sum(CAST(round(value*100) AS BIGINT))
        |           AS BIGINT) AS cents,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM events GROUP BY 1
        |), keys AS (
        |  SELECT unnest(['cents', 'n_events', 'n_users']) AS key
        |)
        |SELECT k.key,
        |       (SELECT CASE k.key WHEN 'n_events' THEN n_events
        |          WHEN 'cents' THEN cents ELSE n_users END
        |        FROM m WHERE event_type = 'click') AS click,
        |       (SELECT CASE k.key WHEN 'n_events' THEN n_events
        |          WHEN 'cents' THEN cents ELSE n_users END
        |        FROM m WHERE event_type = 'error') AS error,
        |       (SELECT CASE k.key WHEN 'n_events' THEN n_events
        |          WHEN 'cents' THEN cents ELSE n_users END
        |        FROM m WHERE event_type = 'purchase') AS purchase,
        |       (SELECT CASE k.key WHEN 'n_events' THEN n_events
        |          WHEN 'cents' THEN cents ELSE n_users END
        |        FROM m WHERE event_type = 'signup') AS signup,
        |       (SELECT CASE k.key WHEN 'n_events' THEN n_events
        |          WHEN 'cents' THEN cents ELSE n_users END
        |        FROM m WHERE event_type = 'view') AS view
        |FROM keys k
        |ORDER BY k.key""".stripMargin,
    "collated_join" ->
      """WITH fact AS (
        |  SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
        |              ELSE event_type END AS em,
        |         value
        |  FROM events
        |), dim AS (
        |  SELECT DISTINCT lower(event_type) AS etype FROM events
        |)
        |SELECT etype, count(*) AS n,
        |       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
        |         AS cents
        |FROM fact JOIN dim ON lower(em) = etype
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
