package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** TPC-H-shaped multi-join analytics over the star schema — the
  * headline "reporting query" family a warehouse user of the reference
  * engine would run (the reference's own flagship is a group-sort
  * report; these are the same shape at warehouse scale: selective
  * dimension predicates, a fact-fact join, grouped revenue, top-N).
  *
  * Scale design:
  *   - `nation`/`region` are genuinely bounded dimensions → explicit
  *     `broadcast()` so the plan never shuffles a fact side for them;
  *   - `customer⋈orders` and `orders⋈lineitem` are fact-fact → hash
  *     shuffle joins on the join key (co-partitionable; at 100 TB both
  *     sides bucket by orderkey/custkey and the exchange disappears —
  *     see BucketedJoinSpec / the `bucketed_join` query);
  *   - revenue sums are integer cents (exact cross-engine, and the
  *     partial-aggregate map-side combine stays a long add);
  *   - top-N is `orderBy(...).limit(n)` → TakeOrderedAndProject, never
  *     a global sort of the full aggregate.
  */
object AnalyticsQueries {

  private def cents(c: Column): Column = Money.cents(c)

  /** Discounted revenue in cents, the TPC-H `l_extendedprice *
    * (1 - l_discount)` term, rounded per-row exactly like the
    * `agg_pricing` convention so every engine sums identical longs.
    */
  private def revCents: Column =
    cents(col("l_extendedprice") * (lit(1) - col("l_discount")))

  private val revCentsSql =
    "CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q3 shape: unshipped-revenue top-10 for one market segment.
    // Predicates sit directly on the scans (pushed to parquet);
    // customer is filtered to ~1/5 before joining orders.
    "tpch_q3" -> ((s, d) => {
      val cust = customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = orders(s, d)
        .filter(col("o_orderdate") < lit("1998-06-30").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-06-30").cast("timestamp"))
        .select(col("l_orderkey"), revCents.as("rev"))
      cust
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(col("rev")).as("revenue_cents"))
        .select(
          col("l_orderkey"),
          col("revenue_cents"),
          // Project convention: timestamps in OUTPUTS always stringify
          // (engine-native timestamp renderings are not hash-stable).
          date_format(col("o_orderdate"), "yyyy-MM-dd")
            .as("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue_cents").desc, col("o_orderdate").asc,
          col("l_orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q5 shape: local-supplier volume per nation in one region —
    // the 6-way join. nation⋈region collapses to a broadcast dim;
    // supplier is key-joined on (suppkey) AND the "local" condition
    // c_nationkey = s_nationkey makes it a genuine multi-equi-key join.
    "tpch_q5" -> ((s, d) => {
      val dims = broadcast(
        nation(s, d)
          .join(
            region(s, d).filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name"))
      val ord = orders(s, d)
        .filter(
          col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), revCents.as("rev"))
      val cust = customer(s, d).select("c_custkey", "c_nationkey")
      val supp = supplier(s, d).select("s_suppkey", "s_nationkey")
      li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(
          supp,
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(dims, col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(col("rev")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("n_name").asc)
    }),

    // TPC-H Q18 shape: large-volume customers. The HAVING-semi-join —
    // qualifying orderkeys come from a grouped quantity filter over
    // lineitem, then rejoin the facts. Both lineitem passes share the
    // orderkey shuffle (AQE exchange reuse); the qualifier side is a
    // LEFT-SEMI, never a distinct+inner; totalprice pins as cents.
    "tpch_q18" -> ((s, d) => {
      val bigOrders = lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 300)
        .select("l_orderkey")
      val li = lineitem(s, d).select("l_orderkey", "l_quantity")
        .join(bigOrders, Seq("l_orderkey"), "left_semi")
      val ord = orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), cents(col("o_totalprice")).as("price_cents"))
      val cust = customer(s, d).select("c_custkey", "c_name")
      li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
          "price_cents")
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
        .select(
          col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("price_cents"), col("sum_qty"))
        .orderBy(col("price_cents").desc, col("o_orderdate").asc,
          col("o_orderkey").asc)
        .limit(100)
    }),

    // TPC-H Q10 shape: top-20 customers by returned-item revenue in one
    // quarter. The returnflag predicate prunes lineitem at the scan;
    // nation broadcasts; the customer attributes ride the aggregation
    // key (functionally dependent on c_custkey).
    "tpch_q10" -> ((s, d) => {
      val ord = orders(s, d)
        .filter(
          col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), revCents.as("rev"))
      val cust = customer(s, d)
        .select(
          col("c_custkey"), col("c_name"),
          cents(col("c_acctbal")).as("acctbal_cents"), col("c_nationkey"))
      val nat = broadcast(nation(s, d).select("n_nationkey", "n_name"))
      li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "acctbal_cents", "n_name")
        .agg(sum(col("rev")).as("revenue_cents"))
        .select(
          col("c_custkey"), col("c_name"), col("revenue_cents"),
          col("acctbal_cents"), col("n_name"))
        .orderBy(col("revenue_cents").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // Ordered event FUNNEL over the events stream: users who viewed,
    // then clicked AT OR AFTER their first view, then purchased at or
    // after that click. Each stage is one aggregation + one
    // user-keyed join — all three shuffles share the user_id key (at
    // scale they co-partition; no window over a user's full history,
    // state per user is one timestamp per stage). Stage comparisons
    // run at SECOND granularity: the fixture carries ns timestamps
    // that Spark truncates to µs (Tables.events), so any finer
    // comparison would diverge from the ns-precise oracle.
    "event_funnel" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), col("event_type"),
          date_trunc("second", col("ts")).as("ts"))
      val viewed = ev
        .filter(col("event_type") === "view")
        .groupBy("user_id")
        .agg(min(col("ts")).as("tv"))
      val clicked = ev
        .filter(col("event_type") === "click")
        .join(viewed, "user_id")
        .filter(col("ts") >= col("tv"))
        .groupBy("user_id")
        .agg(min(col("ts")).as("tc"))
      val purchased = ev
        .filter(col("event_type") === "purchase")
        .join(clicked, "user_id")
        .filter(col("ts") >= col("tc"))
        .groupBy("user_id")
        .agg(min(col("ts")).as("tp"))
      viewed.agg(count(lit(1)).as("n_viewed"))
        .crossJoin(clicked.agg(count(lit(1)).as("n_clicked_after_view")))
        .crossJoin(
          purchased.agg(count(lit(1)).as("n_purchased_after_click")))
    }),

    // Markov TRANSITION MATRIX over per-user event sequences: for
    // each ordered pair of consecutive events of one user, count
    // (src_type → dst_type) and report the row-normalized transition
    // probability in exact ppm — the artifact behavior-model and
    // anomaly passes consume (event_anomaly scores against marginal
    // rates; this is the conditional structure). One window shuffle
    // on user_id (bounded per-user state: the lead is one row), one
    // vocabulary-bounded aggregation; the per-src totals ride a
    // 5-partition window, never a second scan. Ordering is
    // (second-truncated ts, event_id) — the same cross-engine tie
    // contract as event_funnel (the fixture's ns timestamps reach
    // Spark µs-truncated, so finer ordering would diverge from the
    // ns-precise oracle).
    "event_transitions" -> ((s, d) => {
      val wu = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val ws = Window.partitionBy("src")
      events(s, d)
        .select(col("user_id"), col("event_id"),
          col("event_type").as("src"),
          date_trunc("second", col("ts")).as("ts"))
        .withColumn("dst", lead(col("src"), 1).over(wu))
        .filter(col("dst").isNotNull)
        .groupBy("src", "dst")
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum(col("n")).over(ws))
        .withColumn("p_ppm", expr("1000000 * n DIV tot"))
        .select("src", "dst", "n", "p_ppm")
        .orderBy("src", "dst")
    }),

    // FUNNEL LATENCY distribution: time-to-convert per funnel stage
    // (first view → first subsequent click, first click → first
    // subsequent purchase) with EXACT rank-selected percentiles —
    // p50/p90 are the values at ceil-rank positions over the
    // per-stage ordered latency frame, so no interpolation and no
    // float enters the pinned row. Stage frames reuse the funnel's
    // semantics (same second-truncated timeline); the rank window
    // partitions by stage over the users-bounded latency frame;
    // tie order under equal latencies cannot change the selected
    // VALUE, so row_number ordered by latency alone stays
    // deterministic.
    "funnel_latency" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), col("event_type"),
          date_trunc("second", col("ts")).as("ts"))
      val viewed = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("tv"))
      val clicked = ev.filter(col("event_type") === "click")
        .join(viewed, "user_id")
        .filter(col("ts") >= col("tv"))
        .groupBy("user_id").agg(min(col("ts")).as("tc"))
      val purchased = ev.filter(col("event_type") === "purchase")
        .join(clicked, "user_id")
        .filter(col("ts") >= col("tc"))
        .groupBy("user_id").agg(min(col("ts")).as("tp"))
      val lats = clicked.join(viewed, "user_id")
        .select(lit("view_to_click").as("stage"),
          (unix_timestamp(col("tc")) - unix_timestamp(col("tv")))
            .as("lat"))
        .unionByName(purchased.join(clicked, "user_id")
          .select(lit("click_to_purchase").as("stage"),
            (unix_timestamp(col("tp")) - unix_timestamp(col("tc")))
              .as("lat")))
      lats
        .withColumn("rn", row_number().over(
          Window.partitionBy("stage").orderBy("lat")))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy("stage")))
        .groupBy("stage")
        .agg(
          max(col("n")).as("n"),
          min(col("lat")).as("min_s"),
          max(when(col("rn") === expr("(n + 1) DIV 2"), col("lat")))
            .as("p50_s"),
          max(when(col("rn") === expr("(9 * n + 9) DIV 10"),
            col("lat"))).as("p90_s"),
          max(col("lat")).as("max_s"))
        .orderBy("stage")
    }),

    // Behavioral MOTIF MINING: the top-20 event-type TRIGRAMS across
    // per-user sequences — the order-3 extension of
    // `event_transitions` (frequent sub-sequences feed session
    // clustering and bot detection, where single transitions are too
    // coarse). One user-key window carries both leads (two rows of
    // per-user state), the trigram count is a vocabulary³-bounded
    // aggregation, and top-20 rides TakeOrderedAndProject. Same
    // (second-truncated ts, event_id) ordering contract as the
    // transition matrix.
    "event_ngrams" -> ((s, d) => {
      val wu = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_id"),
          col("event_type").as("t1"),
          date_trunc("second", col("ts")).as("ts"))
        .withColumn("t2", lead(col("t1"), 1).over(wu))
        .withColumn("t3", lead(col("t1"), 2).over(wu))
        .filter(col("t3").isNotNull)
        .groupBy("t1", "t2", "t3")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
        .limit(20)
    }),

    // THEIL-SEN TREND — the robust median-slope estimator (an outlier
    // day can't drag it the way least squares lets it): pairwise
    // slopes over the daily revenue series, WINDOWED to day gaps
    // 1..30 so pairs form by exploding the 30 shifted offsets and
    // equi-joining on day position (the acf_daily shape — never a
    // non-equi self-join, which would plan as a nested loop). Slopes
    // kept exact as sign·(1000·|Δy| DIV Δt) milli-kilodollars/day;
    // the lower median and quartiles are rank-selected values over
    // the calendar×30-bounded slope frame.
    "theilsen_trend" -> ((s, d) => {
      val daily = orders(s, d)
        .groupBy(col("o_orderdate").as("day"))
        .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))"
          + " DIV 100000 AS BIGINT)").as("y"))
        .withColumn("t",
          datediff(col("day"), lit("1995-01-01").cast("date"))
            .cast("long"))
      val shifted = daily.select(
          col("y").as("ya"), col("t").as("ta"),
          explode(sequence(lit(1L), lit(30L))).as("gap"))
        .select(col("ya"), col("ta"), col("gap"),
          (col("ta") + col("gap")).as("t"))
      val slopes = shifted
        .join(daily.select(col("t"), col("y").as("yb")), Seq("t"))
        .select(
          (when(col("yb") >= col("ya"), 1L).otherwise(-1L) *
            expr("(1000 * abs(yb - ya)) DIV gap")).as("slope_milli"))
      val w = Window.orderBy("slope_milli")
      slopes
        .withColumn("rn", row_number().over(w).cast("long"))
        .crossJoin(broadcast(
          slopes.agg(count(lit(1)).as("n_pairs"))))
        .filter(
          col("rn") === expr("(n_pairs + 1) DIV 2") ||
            col("rn") === expr("(n_pairs + 1) DIV 4") ||
            col("rn") === expr("(3 * (n_pairs + 1)) DIV 4"))
        .groupBy(col("n_pairs"))
        .agg(
          max(when(col("rn") === expr("(n_pairs + 1) DIV 4"),
            col("slope_milli"))).as("q1_slope_milli"),
          max(when(col("rn") === expr("(n_pairs + 1) DIV 2"),
            col("slope_milli"))).as("median_slope_milli"),
          max(when(col("rn") === expr("(3 * (n_pairs + 1)) DIV 4"),
            col("slope_milli"))).as("q3_slope_milli"))
    }),

    // SEASONAL ANOMALY SCREEN: each order day scored against its own
    // DAY-OF-WEEK population — the de-seasonalized outlier test a
    // forecasting pass runs where a global z-score would just flag
    // every weekend. Entirely exact integers via the cross-multiplied
    // z²: z² = (n·y − Σy)²/(n·Σy² − (Σy)²) per dow group, so
    // z²_ppm = 10⁶·dev² DIV var_num hash-pins; revenue is in
    // kilodollar units, which keeps 10⁶·dev² inside long only up to
    // ~sf1 (|dev| ≤ ~3.0e6; at sf10 a typical day's dev ≈ 4e6 and the
    // multiply would wrap in Spark while DuckDB raises) — beyond sf1
    // use `dow_anomaly_wide`, the DECIMAL(38,0) twin below. The
    // series aggregates to the calendar frame first; the 7-row dow
    // stats broadcast back by an equi-join on dow. Top-10 by z².
    "dow_anomaly" -> ((s, d) => {
      val daily = orders(s, d)
        .groupBy(col("o_orderdate").as("day"))
        .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))"
          + " DIV 100000 AS BIGINT)").as("y"))
        .withColumn("dow", dayofweek(col("day")).cast("long"))
      val dstats = daily.groupBy("dow")
        .agg(
          count(lit(1)).as("n"),
          sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("syy"))
      daily
        .join(broadcast(dstats), Seq("dow"))
        .withColumn("dev", col("n") * col("y") - col("sy"))
        .withColumn("var_num",
          col("n") * col("syy") - col("sy") * col("sy"))
        .withColumn("z2_ppm",
          expr("1000000 * (dev * dev) DIV var_num"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dow"), col("y"), col("dev"),
          col("var_num"), col("z2_ppm"))
        .orderBy(col("z2_ppm").desc, col("day"))
        .limit(10)
    }),

    // The sf10-SAFE twin of dow_anomaly — the "DECIMAL widening is
    // the documented step beyond" made real instead of documented:
    // 10⁶·dev² computes in DECIMAL(38,0) (Spark) against HUGEINT
    // (DuckDB), so the statistic stays exact long past the ~sf1 long
    // bound (10⁶·(4e6)² ≈ 1.6e19 overflows long, fits both wide
    // types with 18 digits to spare); only the final ppm — which
    // always fits long — casts back to BIGINT. Same plan shape and
    // same answer as dow_anomaly at test SF, which is exactly the
    // point: the widening changes the overflow ceiling, not the
    // result.
    "dow_anomaly_wide" -> ((s, d) => {
      val daily = orders(s, d)
        .groupBy(col("o_orderdate").as("day"))
        .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))"
          + " DIV 100000 AS BIGINT)").as("y"))
        .withColumn("dow", dayofweek(col("day")).cast("long"))
      val dstats = daily.groupBy("dow")
        .agg(
          count(lit(1)).as("n"),
          sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("syy"))
      daily
        .join(broadcast(dstats), Seq("dow"))
        .withColumn("dev", col("n") * col("y") - col("sy"))
        .withColumn("var_num",
          col("n") * col("syy") - col("sy") * col("sy"))
        .withColumn("z2_ppm",
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) " +
            "* CAST(dev AS DECIMAL(38,0)) " +
            "* CAST(dev AS DECIMAL(38,0))) " +
            "DIV CAST(var_num AS DECIMAL(38,0)) AS BIGINT)"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dow"), col("y"), col("dev"),
          col("var_num"), col("z2_ppm"))
        .orderBy(col("z2_ppm").desc, col("day"))
        .limit(10)
    }),

    // Day-N retention cohorts: users grouped by their first-seen day,
    // activity counted per (cohort, day offset ≤ 7). Two shuffles
    // (per-user first day, then the cohort×offset rollup); the
    // distinct-user count per cell partial-aggregates map-side.
    "retention_cohorts" -> ((s, d) => {
      val ev = events(s, d)
        .select(
          col("user_id"),
          date_trunc("day", col("ts")).as("day"))
        .distinct()
      val firstDay = ev
        .groupBy("user_id")
        .agg(min(col("day")).as("cohort"))
      ev
        .join(firstDay, "user_id")
        .withColumn("day_offset", datediff(col("day"), col("cohort")))
        .filter(col("day_offset") <= 7)
        .groupBy("cohort", "day_offset")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(
          date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          col("day_offset"),
          col("n_users"))
        .orderBy("cohort", "day_offset")
    }),

    // OPEN-ORDER BACKLOG over time, by SWEEP-LINE delta accumulation:
    // each order contributes +1 at its order day and −1 at its last
    // ship day (open on [order, last-ship) — the fixture schema carries
    // l_shipdate as the fulfillment timestamp), deltas aggregate per
    // day, and one cumulative sum over the CALENDAR-bounded delta
    // frame yields the concurrent-open count — the interval-counting
    // shape that replaces a per-day interval join (which at 100 TB
    // re-scans every open order once per day it spans). Reported at
    // delta days; the count is constant between them.
    "open_orders_daily" -> ((s, d) => {
      val close = lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(max(date_trunc("day", col("l_shipdate"))).as("cday"))
      val spans = orders(s, d)
        .select(col("o_orderkey"),
          date_trunc("day", col("o_orderdate")).as("oday"))
        .join(close, col("o_orderkey") === col("l_orderkey"))
      val deltas = spans
        .select(col("oday").as("day"), lit(1L).as("delta"))
        .unionByName(spans
          .select(col("cday").as("day"), lit(-1L).as("delta")))
        .groupBy("day").agg(sum(col("delta")).as("delta"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas
        .withColumn("n_open", sum(col("delta")).over(w))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("delta"), col("n_open"))
        .orderBy("day")
    }),

    // ABC (Pareto) CLASSIFICATION of parts by revenue: A = parts
    // covering the first 80% of revenue, B = to 95%, C = the tail —
    // the inventory-prioritization rollup. Class membership is the
    // integer rule on the PRE-part cumulative (a straddling part
    // joins the better class): A iff 5·cum_prev < 4·total,
    // B iff 20·cum_prev < 19·total. The cumulative window runs over
    // the parts-bounded aggregated revenue frame ordered by
    // (revenue desc, partkey) — never raw lineitem.
    "abc_classification" -> ((s, d) => {
      val perPart = lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum(cents(col("l_extendedprice"))).as("rev"))
      val w = Window.orderBy(col("rev").desc, col("l_partkey").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      perPart
        .withColumn("cum_prev", coalesce(sum(col("rev")).over(w),
          lit(0L)))
        .crossJoin(broadcast(
          perPart.agg(sum(col("rev")).as("total"))))
        .withColumn("abc_class",
          when(col("cum_prev") * 5 < col("total") * 4, "A")
            .when(col("cum_prev") * 20 < col("total") * 19, "B")
            .otherwise("C"))
        .groupBy("abc_class")
        .agg(
          count(lit(1)).as("n_parts"),
          sum(col("rev")).as("revenue_cents"),
          max(col("total")).as("total"))
        .withColumn("share_ppm",
          expr("1000000 * revenue_cents DIV total"))
        .select("abc_class", "n_parts", "revenue_cents", "share_ppm")
        .orderBy("abc_class")
    }),

    // REVENUE INEQUALITY per market segment: exact Gini coefficient
    // (rank formula G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx) over
    // ascending-sorted per-customer revenue) and the top-decile
    // revenue share — the concentration scorecard behind "do 10% of
    // customers carry the segment". Revenue is scaled to kilodollar
    // units so 10⁶·num stays inside long through sf0.1 (decimal
    // widening is the documented one-liner beyond); both ranks break
    // ties by custkey, though the Gini sum is tie-order-invariant
    // anyway (equal x under any order contribute the same Σi·xᵢ).
    // Windows run over the customers-bounded per-customer frame.
    "revenue_gini" -> ((s, d) => {
      val perCust = orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("c_custkey"))
        .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))"
          + " DIV 100000 AS BIGINT)").as("x"))
      val wAsc = Window.partitionBy("segment")
        .orderBy(col("x").asc, col("c_custkey").asc)
      val wDesc = Window.partitionBy("segment")
        .orderBy(col("x").desc, col("c_custkey").asc)
      perCust
        .withColumn("i", row_number().over(wAsc).cast("long"))
        .withColumn("rd", row_number().over(wDesc).cast("long"))
        .withColumn("nseg",
          count(lit(1)).over(Window.partitionBy("segment")))
        .groupBy("segment")
        .agg(
          count(lit(1)).as("n_cust"),
          sum(col("x")).as("total_kusd"),
          sum(col("i") * col("x")).as("six"),
          // top decile = rd <= ceil(nseg/10) ⟺ 10·rd <= nseg + 9
          sum(when(col("rd") * 10 <= col("nseg") + 9, col("x"))
            .otherwise(0L)).as("top_decile_kusd"))
        .withColumn("gini_num",
          lit(2) * col("six") - (col("n_cust") + 1) * col("total_kusd"))
        .withColumn("gini_ppm",
          expr("1000000 * gini_num DIV (n_cust * total_kusd)"))
        .withColumn("top10_share_ppm",
          expr("1000000 * top_decile_kusd DIV total_kusd"))
        .select("segment", "n_cust", "total_kusd", "gini_num",
          "gini_ppm", "top_decile_kusd", "top10_share_ppm")
        .orderBy("segment")
    }),

    // DAILY ACTIVE ROLLUP: per activity day, DAU (distinct users),
    // trailing-7-day WAU, and first-time users — the engagement
    // scorecard every product dashboard opens with. Everything
    // derives from ONE distinct (user, day) frame (the only row-scale
    // shuffle): DAU is its day rollup, WAU explodes each activity row
    // into the 7 target days it supports and counts distinct users
    // per target (countDistinct absorbs multi-day users — no
    // sliding-window distinct state), n_new joins the per-user
    // first-day frame. Output limited to days with direct activity.
    "daily_active_rollup" -> ((s, d) => {
      val ud = events(s, d)
        .select(col("user_id"),
          date_trunc("day", col("ts")).as("day"))
        .distinct()
      val dau = ud.groupBy("day")
        .agg(countDistinct(col("user_id")).as("dau"))
      val wau = ud
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("k"), col("day"))
        .select(col("user_id"),
          date_add(col("day"), col("k")).cast("timestamp").as("wday"))
        .groupBy(col("wday").as("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
      val fresh = ud.groupBy("user_id")
        .agg(min(col("day")).as("day"))
        .groupBy("day")
        .agg(count(lit(1)).as("n_new"))
      dau
        .join(wau, Seq("day"))
        .join(fresh, Seq("day"), "left")
        .select(
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("wau"),
          coalesce(col("n_new"), lit(0L)).as("n_new"))
        .orderBy("day")
    }),

    // COHORT REVENUE (LTV curve): purchase revenue per first-seen-day
    // cohort per WEEK offset — the monetary companion of
    // `retention_cohorts` (activity says users came back; this says
    // what the cohort is worth as it ages, the curve every
    // acquisition decision discounts against). First-day frame is one
    // per-user aggregation; purchase cents join their user's cohort
    // on the user key; the rollup is (cohort × offset)-bounded. All
    // cents exact.
    "cohort_revenue" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"),
          date_trunc("day", col("ts")).as("day"),
          col("event_type"), col("value"))
      val firstDay = ev.groupBy("user_id")
        .agg(min(col("day")).as("cohort"))
      ev.filter(col("event_type") === "purchase")
        .join(firstDay, "user_id")
        .withColumn("week_offset",
          expr("CAST(datediff(day, cohort) DIV 7 AS BIGINT)"))
        .groupBy("cohort", "week_offset")
        .agg(
          countDistinct(col("user_id")).as("n_buyers"),
          count(lit(1)).as("n_purchases"),
          sum(cents(col("value"))).as("revenue_cents"))
        .select(
          date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          col("week_offset"), col("n_buyers"), col("n_purchases"),
          col("revenue_cents"))
        .orderBy("cohort", "week_offset")
    }),

    // Equal-frequency DISCRETIZATION (decile binning) — the feature
    // transform a training pipeline applies to heavy-tailed numerics:
    // bin = ((rank − 1) · 10) DIV n over the (cents, orderkey)-ranked
    // group, so bins are integer-exact and the tie order is pinned by
    // the key. Output is the per-(group, bin) profile a feature store
    // keeps; the window partitions by group, never globally.
    "quantile_bins" -> ((s, d) => {
      val v = orders(s, d)
        .select(col("o_orderpriority").as("prio"), col("o_orderkey"),
          cents(col("o_totalprice")).as("v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("prio").orderBy(col("v").asc, col("o_orderkey").asc)
      val n = v.groupBy("prio").agg(count(lit(1)).as("n"))
      v.withColumn("rn", row_number().over(w))
        .join(n, "prio")
        .withColumn("bin", expr("((rn - 1) * 10) DIV n"))
        .groupBy("prio", "bin")
        .agg(
          count(lit(1)).as("n_rows"),
          min(col("v")).as("lo_cents"),
          max(col("v")).as("hi_cents"))
        .orderBy("prio", "bin")
    }),

    // Smoothed TARGET ENCODING — the categorical-feature encoder:
    // enc = (Σ target + m·prior) DIV (n + m) with m=10 and the prior
    // the global mean, all in integer cents (one floor division per
    // level, one for the prior) so the encoding table hash-pins. The
    // prior is a one-row broadcast; per-level state is (n, sum).
    "target_encoding" -> ((s, d) => {
      val v = customer(s, d)
        .select(col("c_mktsegment").as("segment"),
          cents(col("c_acctbal")).as("v"))
      val prior = v.agg(
        expr("CAST(sum(v) DIV count(*) AS BIGINT)").as("prior_cents"))
      v.groupBy("segment")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_cents"))
        .crossJoin(broadcast(prior)) // ONE-ROW prior
        .select(
          col("segment"), col("n"),
          expr("CAST(sum_cents DIV n AS BIGINT)").as("raw_mean_cents"),
          col("prior_cents"),
          expr("CAST((sum_cents + 10 * prior_cents) DIV (n + 10) " +
            "AS BIGINT)").as("encoded_cents"))
        .orderBy("segment")
    }),

    // Grouped OLS trend fit — "is revenue trending up per priority
    // class": daily revenue (integer dollars) regressed on the day
    // index, per group. Sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    // are EXACT integer sums that partial-aggregate map-side — the
    // one-pass distributed regression shape — and the slope is
    // emitted both as an exact integer fraction (numerator /
    // denominator, hash-pinned) and as the single-division double.
    // Dollars (not cents) keep n·Σxy far from int64 range at any
    // gate sf.
    "linreg_daily_revenue" -> ((s, d) => {
      val daily = orders(s, d)
        .select(
          col("o_orderpriority").as("prio"),
          datediff(to_date(col("o_orderdate")),
            lit("1990-01-01").cast("date")).cast("long").as("x"),
          cents(col("o_totalprice")).as("cents"))
        .groupBy("prio", "x")
        .agg(expr("CAST(sum(cents) DIV 100 AS BIGINT)").as("y"))
      daily.groupBy("prio")
        .agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(
          col("prio"), col("n"),
          (col("n") * col("sxy") - col("sx") * col("sy"))
            .as("slope_num"),
          (col("n") * col("sxx") - col("sx") * col("sx"))
            .as("slope_den"),
          col("sx"), col("sy"))
        .withColumn("slope",
          col("slope_num").cast("double") / col("slope_den").cast("double"))
        .withColumn("intercept",
          (col("sy").cast("double") - col("slope") * col("sx").cast("double"))
            / col("n").cast("double"))
        .select(col("prio"), col("n"), col("slope_num"),
          col("slope_den"), col("slope"), col("intercept"))
        .orderBy("prio")
    }),

    // AUTOCORRELATION of the daily-revenue series at lags 1..7 — the
    // seasonality screen a forecasting pass runs before fitting
    // anything. The series first aggregates to one row per order day
    // (calendar-bounded — windows beyond this point run over ~2400
    // rows, never raw orders), positions come from a row_number over
    // the bounded frame, and each lag's pairs form by EXPLODING the
    // 7 shifted positions and equi-joining on position — never a
    // non-equi self-join. Per lag the five Pearson sufficient
    // statistics stay exact longs: revenue is scaled to "kilodollar"
    // units (cents DIV 100000) so n·Σxy holds inside long range
    // through sf10 (decimal widening is the documented one-liner
    // beyond); num/den1/den2 are the cross-multiplied numerator and
    // variance terms — r = num/√(den1·den2) is the consumer's one
    // float, kept out of the pinned output.
    "acf_daily" -> ((s, d) => {
      val daily = orders(s, d)
        .groupBy(col("o_orderdate").as("day"))
        .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))"
          + " DIV 100000 AS BIGINT)").as("y"))
      val wPos = org.apache.spark.sql.expressions.Window.orderBy("day")
      val srs = daily
        .withColumn("rn", row_number().over(wPos).cast("long"))
        .select("rn", "y")
      val shifted = srs.select(
          col("y").as("ya"),
          explode(sequence(lit(1L), lit(7L))).as("lag"),
          col("rn"))
        .select(col("ya"), col("lag"), (col("rn") + col("lag")).as("rn"))
      shifted
        .join(srs.withColumnRenamed("y", "yb"), Seq("rn"))
        .groupBy("lag")
        .agg(
          count(lit(1)).as("n"),
          sum(col("ya")).as("sx"),
          sum(col("yb")).as("sy"),
          sum(col("ya") * col("yb")).as("sxy"),
          sum(col("ya") * col("ya")).as("sxx"),
          sum(col("yb") * col("yb")).as("syy"))
        .select(
          col("lag"), col("n"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("den1"),
          (col("n") * col("syy") - col("sy") * col("sy")).as("den2"))
        .orderBy("lag")
    }),

    // CUMULATIVE REACH — unique users ever seen, by day (the growth
    // curve next to daily_active_rollup's DAU/WAU): running
    // countDistinct would need unbounded dedup state, so the curve
    // computes from each user's FIRST-SEEN day (one distinct-user
    // aggregation) joined to the observed-day calendar with a
    // cumulative sum over the 30-row day frame — days with zero new
    // users still advance the curve.
    "reach_curve" -> ((s, d) => {
      val userDay = events(s, d)
        .groupBy(col("user_id"))
        .agg(min(expr("CAST(unix_micros(CAST(ts AS TIMESTAMP)) " +
          "DIV 86400000000 AS BIGINT)")).as("first_day"))
        .groupBy(col("first_day").as("day"))
        .agg(count(lit(1)).as("n_new"))
      val calendar = events(s, d)
        .select(expr("CAST(unix_micros(CAST(ts AS TIMESTAMP)) " +
          "DIV 86400000000 AS BIGINT)").as("day"))
        .distinct()
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      calendar
        .join(userDay, Seq("day"), "left")
        .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
        .withColumn("cum_users", sum(col("n_new")).over(w))
        .orderBy("day")
    }),

    // ACTIVITY STREAKS — longest run of CONSECUTIVE active days per
    // user, the classic gaps-and-islands: island id = day −
    // dense_rank over the user's distinct active days (constant
    // within a consecutive run), then a per-island length and a
    // per-user max. Top-20 streaks, fully tiebroken. Windows run
    // over the distinct (user, day) frame — bounded by users ×
    // active days, with per-user partitions, never one global sort.
    "user_streaks" -> ((s, d) => {
      val days = events(s, d)
        .select(
          col("user_id"),
          expr("CAST(unix_micros(CAST(ts AS TIMESTAMP)) " +
            "DIV 86400000000 AS BIGINT)").as("day"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      days
        .withColumn("grp",
          col("day") - dense_rank().over(w).cast("long"))
        .groupBy("user_id", "grp")
        .agg(
          count(lit(1)).as("len"),
          min(col("day")).as("start_day"))
        .groupBy("user_id")
        .agg(
          max(struct(col("len"), (-col("start_day")).as("ns")))
            .as("best"),
          count(lit(1)).as("n_streaks"))
        .select(
          col("user_id"),
          col("best.len").as("longest_streak"),
          (-col("best.ns")).as("streak_start_day"),
          col("n_streaks"))
        .orderBy(col("longest_streak").desc, col("user_id"))
        .limit(20)
    }),

    // SHARE-OF-PARENT hierarchical rollup — the drill-down ratio
    // report (what % of its region is each nation, what % of total
    // each region) every BI tree view renders. One revenue
    // aggregation at the leaf grain; the two parent totals are
    // WINDOW sums over the ~25-row aggregated frame (never a second
    // scan), shares exact integer ppm.
    "share_of_parent" -> ((s, d) => {
      val leaf = customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(broadcast(nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey"), col("n_name"))
        .agg(sum(cents(col("o_totalprice"))).as("cents"))
      val wr = Window.partitionBy("n_regionkey")
      val wt = Window.partitionBy()
      leaf
        .withColumn("region_cents", sum(col("cents")).over(wr))
        .withColumn("total_cents", sum(col("cents")).over(wt))
        .select(
          col("n_regionkey").cast("long").as("regionkey"),
          col("n_name").as("nation"),
          col("cents"),
          expr("1000000 * cents DIV region_cents")
            .as("share_of_region_ppm"),
          expr("1000000 * region_cents DIV total_cents")
            .as("region_share_ppm"))
        .orderBy("regionkey", "nation")
    }),

    // TIME-CONSTRAINED funnel — event_funnel orders stages by min
    // timestamp with no deadline; real conversion attribution bounds
    // each hop (click within 24 h of a view, purchase within 24 h of
    // a QUALIFIED click — a day, because the fixture's per-user event
    // rate is ~0.2/day and an hour-bounded hop would never chain). Stages chain as user-key equi joins with the
    // hop bound as a join predicate — per-user in-window pair counts
    // are rate×window bounded, so the join never goes quadratic in
    // history length. Distinct-id semi-join between stages keeps one
    // row per qualifying event no matter how many antecedents.
    "funnel_windowed" -> ((s, d) => {
      val ev = events(s, d).select(
        col("event_id"), col("user_id"), col("event_type"),
        graft.Tables.tsMicros(col("ts")).as("tus"))
      val hopUs = 86400L * 1000000L
      def stage(t: String) = ev.filter(col("event_type") === t)
      val qClicks = stage("click").as("c")
        .join(stage("view").as("v"),
          col("c.user_id") === col("v.user_id") &&
            col("v.tus") > col("c.tus") - hopUs &&
            col("v.tus") <= col("c.tus"))
        .select(col("c.event_id").as("click_id"),
          col("c.user_id").as("user_id"),
          col("c.tus").as("click_tus"))
        .distinct()
      val qPurch = stage("purchase").as("p")
        .join(qClicks.as("q"),
          col("p.user_id") === col("q.user_id") &&
            col("q.click_tus") > col("p.tus") - hopUs &&
            col("q.click_tus") <= col("p.tus"))
        .select(col("p.event_id").as("purchase_id"),
          col("p.user_id").as("user_id"))
        .distinct()
      val c = qClicks.agg(
        count(lit(1)).as("n_qualified_clicks"),
        countDistinct(col("user_id")).as("n_click_users"))
      val p = qPurch.agg(
        count(lit(1)).as("n_qualified_purchases"),
        countDistinct(col("user_id")).as("n_purchase_users"))
      c.crossJoin(p)
    }),

    // ACCOUNTS-RECEIVABLE AGING — the finance close report: every
    // order still OPEN at the as-of date (ordered on or before it,
    // last shipment strictly after it) bucketed by how long it has
    // been open. The per-order last-ship date is one key-equi
    // aggregation join (the open_orders_daily machinery at a single
    // as-of point); bands are closed-form integer CASE cuts, so the
    // report is one scan + one join + one 4-row rollup at any scale.
    "order_aging" -> ((s, d) => {
      val asof = lit("1998-01-01").cast("date")
      val lastShip = lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("last_ship"))
      orders(s, d)
        .join(lastShip, col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate") <= asof && col("last_ship") > asof)
        .withColumn("days_open", datediff(asof, col("o_orderdate")))
        .withColumn("band",
          when(col("days_open") <= 30, "a_0_30")
            .when(col("days_open") <= 90, "b_31_90")
            .when(col("days_open") <= 365, "c_91_365")
            .otherwise("d_365_plus"))
        .groupBy("band")
        .agg(
          count(lit(1)).as("n_open"),
          sum(cents(col("o_totalprice"))).as("open_cents"),
          min(col("days_open").cast("long")).as("min_days"),
          max(col("days_open").cast("long")).as("max_days"))
        .orderBy("band")
    }),

    // Pairwise CORRELATION MATRIX in ONE scan — the EDA pass over a
    // metric vector (order price, line count, quantity sum, discount
    // sum per order) computing all six pairwise Pearson sufficient-
    // statistic triples from a single aggregation, not one
    // corr() scan per pair. All sums exact longs over integer-scaled
    // metrics; num/den cross-multiplied as in acf_daily, the one
    // float left to the consumer. Output unpivots to the 6-row
    // (metric_a, metric_b) triangle.
    "corr_matrix" -> ((s, d) => {
      val m = lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(
          count(lit(1)).as("m_lines"),
          sum(col("l_quantity").cast("long")).as("m_qty"),
          sum(cents(col("l_discount"))).as("m_disc"),
          // Kilodollar units: n·Σ(m_price²) must stay inside long —
          // ~2e15 at sf0.1, ~2e17 at sf1; DECIMAL widening is the
          // documented step beyond (the dow_anomaly convention).
          sum(expr("CAST(round(l_extendedprice*100) AS BIGINT)" +
            " DIV 100000")).as("m_price"))
      val metrics = Seq("m_lines", "m_qty", "m_disc", "m_price")
      val aggs = metrics.map(a => sum(col(a)).as(s"s_$a")) ++
        metrics.map(a => sum(col(a) * col(a)).as(s"ss_$a")) ++
        (for {
          i <- metrics.indices; j <- i + 1 until metrics.size
        } yield sum(col(metrics(i)) * col(metrics(j)))
          .as(s"sp_${metrics(i)}_${metrics(j)}")) :+
        count(lit(1)).as("n")
      val one = m.agg(aggs.head, aggs.tail: _*)
      val pairs = for {
        i <- metrics.indices; j <- i + 1 until metrics.size
        a = metrics(i); b = metrics(j)
      } yield s"'$a', '$b', n * sp_${a}_$b - s_$a * s_$b, " +
        s"n * ss_$a - s_$a * s_$a, n * ss_$b - s_$b * s_$b"
      one.select(
        expr(s"stack(${pairs.size}, ${pairs.mkString(", ")}) " +
          "AS (metric_a, metric_b, num, den_a, den_b)"))
        .orderBy("metric_a", "metric_b")
    }),

    // MATCH_RECOGNIZE stand-in — Spark has no row-pattern clause, so
    // the canonical DOWN{2} UP{2} V-shape pattern compiles to lag/lead
    // comparisons over the ordered series instead: day t matches when
    // y(t-2) > y(t-1) > y(t) < y(t+1) < y(t+2), strict, which is
    // exactly the pattern's match-at-trough semantics with no
    // backtracking needed because the pattern is fixed-length. Runs
    // over the CALENDAR-BOUNDED daily revenue frame (~2.4k rows at
    // any SF — the same scale contract as acf_daily), never raw
    // orders; depth_cents measures the V's arms for ranking. A
    // variable-length pattern (DOWN+ UP+) would move to the
    // gaps-and-islands form exact_substring_spans uses.
    "pattern_vshape" -> ((s, d) => {
      val daily = orders(s, d)
        .groupBy(col("o_orderdate").as("day"))
        .agg(sum(cents(col("o_totalprice"))).as("y"))
      val w = Window.orderBy("day")
      daily
        .withColumn("p2", lag(col("y"), 2).over(w))
        .withColumn("p1", lag(col("y"), 1).over(w))
        .withColumn("n1", lead(col("y"), 1).over(w))
        .withColumn("n2", lead(col("y"), 2).over(w))
        .filter(
          col("p2") > col("p1") && col("p1") > col("y") &&
            col("y") < col("n1") && col("n1") < col("n2"))
        .select(
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("y"),
          (col("p1") - col("y") + col("n1") - col("y"))
            .as("depth_cents"))
        .orderBy("day")
    }),

    // Month-over-month / year-over-year growth — the calendar-aligned
    // BI report every revenue dashboard leads with. Deltas are exact
    // integer ppm with the SIGN FACTORED OUT of the division
    // (sign·(10⁶·|Δ| DIV prev)) because Spark's DIV truncates toward
    // zero while DuckDB's // floors — they agree only on non-negative
    // operands (the embedding_drift rule). First months carry NULL
    // deltas in both engines. Prior periods come from CALENDAR-keyed
    // self-joins (add_months −1 / −12), not lag(1)/lag(12) row
    // offsets: a gap month in the series would silently shift a
    // row-offset comparison to the wrong month while both engines
    // drift identically, so the gate could never catch it. The joins
    // run over the ~80-row month frame (broadcast-sized at any raw
    // scale), never raw orders.
    "monthly_yoy" -> ((s, d) => {
      val monthly = orders(s, d)
        .groupBy(trunc(col("o_orderdate"), "mm").as("month_d"))
        .agg(sum(cents(col("o_totalprice"))).as("y"))
      val pm = monthly.select(col("month_d").as("pm_d"),
        col("y").as("prev_m"))
      val py = monthly.select(col("month_d").as("py_d"),
        col("y").as("prev_y"))
      monthly
        .join(pm, add_months(col("month_d"), -1) === col("pm_d"), "left")
        .join(py, add_months(col("month_d"), -12) === col("py_d"), "left")
        .select(
          date_format(col("month_d"), "yyyy-MM").as("month"), col("y"),
          (when(col("y") >= col("prev_m"), 1L).otherwise(-1L) *
            expr("(1000000 * abs(y - prev_m)) DIV prev_m"))
            .as("mom_ppm"),
          (when(col("y") >= col("prev_y"), 1L).otherwise(-1L) *
            expr("(1000000 * abs(y - prev_y)) DIV prev_y"))
            .as("yoy_ppm"))
        .orderBy("month")
    }),

    // The GAP-MONTH twin of monthly_yoy — the hazard that motivated
    // the calendar-keyed join, pinned behaviorally: one mid-series
    // month (1995-06) is dropped from the month frame, and the gate
    // proves the comparisons stay calendar-aligned — 1995-07's MoM
    // and 1996-06's YoY are NULL (their prior period is the gap), and
    // every other month compares against its true calendar
    // predecessor. A lag(1)/lag(12) row-offset form would instead
    // silently shift every post-gap comparison one month — in BOTH
    // engines identically, which is exactly why the plain gate could
    // never catch it and this one exists.
    "monthly_yoy_gapped" -> ((s, d) => {
      val monthly = orders(s, d)
        .groupBy(trunc(col("o_orderdate"), "mm").as("month_d"))
        .agg(sum(cents(col("o_totalprice"))).as("y"))
        .filter(date_format(col("month_d"), "yyyy-MM") =!= "1995-06")
      val pm = monthly.select(col("month_d").as("pm_d"),
        col("y").as("prev_m"))
      val py = monthly.select(col("month_d").as("py_d"),
        col("y").as("prev_y"))
      monthly
        .join(pm, add_months(col("month_d"), -1) === col("pm_d"), "left")
        .join(py, add_months(col("month_d"), -12) === col("py_d"), "left")
        .select(
          date_format(col("month_d"), "yyyy-MM").as("month"), col("y"),
          (when(col("y") >= col("prev_m"), 1L).otherwise(-1L) *
            expr("(1000000 * abs(y - prev_m)) DIV prev_m"))
            .as("mom_ppm"),
          (when(col("y") >= col("prev_y"), 1L).otherwise(-1L) *
            expr("(1000000 * abs(y - prev_y)) DIV prev_y"))
            .as("yoy_ppm"))
        .orderBy("month")
    }),

    // Two-proportion A/B test on user conversion (converted = at
    // least 14 purchase events — a median split of the fixture's
    // per-user purchase counts, so both proportions stay mid-range
    // and the pooled variance never degenerates to zero at any SF;
    // "has any purchase" converts 100% of this dense fixture and
    // divides by zero), arms split by user-id parity — the experiment
    // readout a growth team runs, kept exact: the pooled z² statistic
    // cross-multiplies into one integer ratio,
    //   z² = (c1·n2 − c2·n1)²·(n1+n2) / (n1·n2·c·(n−c)),
    // reported as z2_milli = 10³·num DIV den (10³, not ppm, keeps
    // 10³·num inside long through sf0.1's 1.5k users; beyond that the
    // documented step is DECIMAL widening, the dow_anomaly rule).
    // One distinct-user aggregation is the only row-scale shuffle;
    // the 2×2 table folds on the driver-free one-row frame.
    "ab_proportion_test" -> ((s, d) => {
      val users = events(s, d)
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("n_purch"))
        .withColumn("conv",
          when(col("n_purch") >= 14, 1L).otherwise(0L))
        .withColumn("arm", (col("user_id") % 2).cast("long"))
      users
        .agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0, col("conv")).otherwise(0L))
            .as("c1"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
          sum(when(col("arm") === 1, col("conv")).otherwise(0L))
            .as("c2"))
        .withColumn("num",
          (col("c1") * col("n2") - col("c2") * col("n1")) *
            (col("c1") * col("n2") - col("c2") * col("n1")) *
            (col("n1") + col("n2")))
        .withColumn("den",
          col("n1") * col("n2") * (col("c1") + col("c2")) *
            (col("n1") + col("n2") - col("c1") - col("c2")))
        .select(
          col("n1"), col("c1"), col("n2"), col("c2"),
          expr("1000 * num DIV den").as("z2_milli"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tpch_q3" ->
      s"""SELECT l_orderkey,
         |       CAST(sum($revCentsSql) AS BIGINT) AS revenue_cents,
         |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         |       o_orderpriority
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-30'
         |  AND l_shipdate > TIMESTAMP '1998-06-30'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue_cents DESC, o_orderdate ASC, l_orderkey ASC
         |LIMIT 10""".stripMargin,
    "tpch_q5" ->
      s"""SELECT n_name,
         |       CAST(sum($revCentsSql) AS BIGINT) AS revenue_cents
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |  AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name
         |ORDER BY revenue_cents DESC, n_name ASC""".stripMargin,
    "tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |       CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate,
        |         o_totalprice
        |ORDER BY price_cents DESC, o_orderdate ASC, o_orderkey ASC
        |LIMIT 100""".stripMargin,
    "tpch_q10" ->
      s"""SELECT c_custkey, c_name,
         |       CAST(sum($revCentsSql) AS BIGINT) AS revenue_cents,
         |       CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents,
         |       n_name
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-04-01'
         |GROUP BY c_custkey, c_name, acctbal_cents, n_name
         |ORDER BY revenue_cents DESC, c_custkey ASC
         |LIMIT 20""".stripMargin,
    "event_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, date_trunc('second', ts) AS ts
        |  FROM events
        |), viewed AS (
        |  SELECT user_id, min(ts) AS tv FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id
        |), clicked AS (
        |  SELECT e.user_id, min(e.ts) AS tc
        |  FROM ev e JOIN viewed v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.tv
        |  GROUP BY e.user_id
        |), purchased AS (
        |  SELECT e.user_id, min(e.ts) AS tp
        |  FROM ev e JOIN clicked c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.tc
        |  GROUP BY e.user_id
        |)
        |SELECT (SELECT count(*) FROM viewed) AS n_viewed,
        |       (SELECT count(*) FROM clicked) AS n_clicked_after_view,
        |       (SELECT count(*) FROM purchased)
        |         AS n_purchased_after_click""".stripMargin,
    "event_transitions" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type AS src,
        |         date_trunc('second', ts) AS ts
        |  FROM events
        |), prs AS (
        |  SELECT src, lead(src) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS dst
        |  FROM ev
        |), cnt AS (
        |  SELECT src, dst, count(*) AS n FROM prs
        |  WHERE dst IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT src, dst, n,
        |       CAST(1000000 * n // sum(n) OVER (PARTITION BY src)
        |         AS BIGINT) AS p_ppm
        |FROM cnt ORDER BY src, dst""".stripMargin,
    "retention_cohorts" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day
        |  FROM events
        |), first_day AS (
        |  SELECT user_id, min(day) AS cohort FROM active
        |  GROUP BY user_id
        |)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
        |       CAST(datediff('day', cohort, day) AS INTEGER)
        |         AS day_offset,
        |       count(DISTINCT a.user_id) AS n_users
        |FROM active a JOIN first_day f ON a.user_id = f.user_id
        |WHERE datediff('day', cohort, day) <= 7
        |GROUP BY f.cohort, day_offset
        |ORDER BY cohort, day_offset""".stripMargin,
    "open_orders_daily" ->
      """WITH cl AS (
        |  SELECT l_orderkey,
        |         max(date_trunc('day', l_shipdate)) AS cday
        |  FROM lineitem GROUP BY 1
        |), sp AS (
        |  SELECT date_trunc('day', o.o_orderdate) AS oday, c.cday
        |  FROM orders o JOIN cl c ON c.l_orderkey = o.o_orderkey
        |), dl AS (
        |  SELECT day, CAST(sum(delta) AS BIGINT) AS delta FROM (
        |    SELECT oday AS day, 1 AS delta FROM sp
        |    UNION ALL SELECT cday, -1 FROM sp
        |  ) u GROUP BY 1
        |)
        |SELECT strftime(day, '%Y-%m-%d') AS day, delta,
        |       CAST(sum(delta) OVER (ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS n_open
        |FROM dl ORDER BY day""".stripMargin,
    "abc_classification" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
        |           AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1
        |), t AS (SELECT CAST(sum(rev) AS BIGINT) AS total FROM pp),
        |c AS (
        |  SELECT rev,
        |         coalesce(sum(rev) OVER (ORDER BY rev DESC,
        |           l_partkey ASC ROWS BETWEEN UNBOUNDED PRECEDING
        |           AND 1 PRECEDING), 0) AS cum_prev
        |  FROM pp
        |), cls AS (
        |  SELECT CASE
        |           WHEN c.cum_prev * 5 < t.total * 4 THEN 'A'
        |           WHEN c.cum_prev * 20 < t.total * 19 THEN 'B'
        |           ELSE 'C' END AS abc_class,
        |         c.rev, t.total
        |  FROM c CROSS JOIN t
        |)
        |SELECT abc_class, count(*) AS n_parts,
        |       CAST(sum(rev) AS BIGINT) AS revenue_cents,
        |       CAST(1000000 * CAST(sum(rev) AS BIGINT)
        |         // max(total) AS BIGINT) AS share_ppm
        |FROM cls GROUP BY 1 ORDER BY abc_class""".stripMargin,
    "revenue_gini" ->
      """WITH pc AS (
        |  SELECT c.c_mktsegment AS segment, c.c_custkey,
        |         CAST(CAST(sum(CAST(round(o.o_totalprice*100)
        |           AS BIGINT)) AS BIGINT) // 100000 AS BIGINT) AS x
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT segment, x,
        |         CAST(row_number() OVER (PARTITION BY segment
        |           ORDER BY x ASC, c_custkey ASC) AS BIGINT) AS i,
        |         CAST(row_number() OVER (PARTITION BY segment
        |           ORDER BY x DESC, c_custkey ASC) AS BIGINT) AS rd,
        |         count(*) OVER (PARTITION BY segment) AS nseg
        |  FROM pc
        |), g AS (
        |  SELECT segment, count(*) AS n_cust,
        |         CAST(sum(x) AS BIGINT) AS total_kusd,
        |         CAST(sum(i * x) AS BIGINT) AS six,
        |         CAST(sum(CASE WHEN rd * 10 <= nseg + 9 THEN x
        |           ELSE 0 END) AS BIGINT) AS top_decile_kusd
        |  FROM r GROUP BY 1
        |)
        |SELECT segment, n_cust, total_kusd,
        |       2 * six - (n_cust + 1) * total_kusd AS gini_num,
        |       CAST(1000000 * (2 * six - (n_cust + 1) * total_kusd)
        |         // (n_cust * total_kusd) AS BIGINT) AS gini_ppm,
        |       top_decile_kusd,
        |       CAST(1000000 * top_decile_kusd // total_kusd AS BIGINT)
        |         AS top10_share_ppm
        |FROM g ORDER BY segment""".stripMargin,
    "daily_active_rollup" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day
        |  FROM events
        |), dau AS (
        |  SELECT day, count(DISTINCT user_id) AS dau FROM ud
        |  GROUP BY 1
        |), wau AS (
        |  SELECT wday AS day, count(DISTINCT user_id) AS wau FROM (
        |    SELECT u.user_id, u.day + INTERVAL (g.k) DAY AS wday
        |    FROM ud u, (SELECT unnest(generate_series(0, 6)) AS k) g
        |  ) x GROUP BY 1
        |), fresh AS (
        |  SELECT day, count(*) AS n_new FROM (
        |    SELECT user_id, min(day) AS day FROM ud GROUP BY 1
        |  ) f GROUP BY 1
        |)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
        |       CAST(coalesce(f.n_new, 0) AS BIGINT) AS n_new
        |FROM dau d
        |JOIN wau w ON w.day = d.day
        |LEFT JOIN fresh f ON f.day = d.day
        |ORDER BY day""".stripMargin,
    "cohort_revenue" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('day', ts) AS day,
        |         event_type, value
        |  FROM events
        |), fd AS (
        |  SELECT user_id, min(day) AS cohort FROM ev GROUP BY 1
        |)
        |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort,
        |       CAST(datediff('day', f.cohort, e.day) // 7 AS BIGINT)
        |         AS week_offset,
        |       count(DISTINCT e.user_id) AS n_buyers,
        |       count(*) AS n_purchases,
        |       CAST(sum(CAST(round(e.value * 100) AS BIGINT))
        |         AS BIGINT) AS revenue_cents
        |FROM ev e JOIN fd f ON f.user_id = e.user_id
        |WHERE e.event_type = 'purchase'
        |GROUP BY 1, 2 ORDER BY cohort, week_offset""".stripMargin,
    "quantile_bins" ->
      """WITH v AS (
        |  SELECT o_orderpriority AS prio, o_orderkey,
        |         CAST(round(o_totalprice*100) AS BIGINT) AS v
        |  FROM orders),
        |n_ AS (SELECT prio, count(*) AS n FROM v GROUP BY prio),
        |r AS (
        |  SELECT prio, v,
        |         row_number() OVER (PARTITION BY prio
        |           ORDER BY v ASC, o_orderkey ASC) AS rn
        |  FROM v)
        |SELECT r.prio, ((r.rn - 1) * 10) // n_.n AS bin,
        |       count(*) AS n_rows,
        |       min(r.v) AS lo_cents, max(r.v) AS hi_cents
        |FROM r JOIN n_ ON n_.prio = r.prio
        |GROUP BY r.prio, bin ORDER BY r.prio, bin""".stripMargin,
    // Divisions use the trunc-toward-zero form (a − a % b) // b to
    // match Spark's DIV even if a regenerated fixture turns a
    // segment's balance sum negative (DuckDB // floors).
    "target_encoding" ->
      """WITH v AS (
        |  SELECT c_mktsegment AS segment,
        |         CAST(round(c_acctbal*100) AS BIGINT) AS v
        |  FROM customer),
        |p AS (
        |  SELECT CAST((s - s % n) // n AS BIGINT) AS prior_cents
        |  FROM (SELECT CAST(sum(v) AS BIGINT) AS s, count(*) AS n
        |        FROM v) t),
        |g AS (SELECT segment, count(*) AS n,
        |             CAST(sum(v) AS BIGINT) AS sum_cents
        |      FROM v GROUP BY segment)
        |SELECT segment, n,
        |       CAST((sum_cents - sum_cents % n) // n AS BIGINT)
        |         AS raw_mean_cents,
        |       prior_cents,
        |       CAST(((sum_cents + 10 * prior_cents)
        |         - (sum_cents + 10 * prior_cents) % (n + 10))
        |         // (n + 10) AS BIGINT) AS encoded_cents
        |FROM g, p ORDER BY segment""".stripMargin,
    // Slope as the exact integer fraction; the doubles are single
    // IEEE operations over those exact integers, written in the
    // identical op order as the Spark side.
    "linreg_daily_revenue" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio,
        |         date_diff('day', DATE '1990-01-01',
        |           CAST(o_orderdate AS DATE)) AS x,
        |         CAST(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |           AS BIGINT) // 100 AS BIGINT) AS y
        |  FROM orders GROUP BY 1, 2),
        |st AS (
        |  SELECT prio, count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x*y) AS BIGINT) AS sxy,
        |         CAST(sum(x*x) AS BIGINT) AS sxx
        |  FROM daily GROUP BY prio),
        |sl AS (
        |  SELECT prio, n, n*sxy - sx*sy AS slope_num,
        |         n*sxx - sx*sx AS slope_den, sx, sy
        |  FROM st)
        |SELECT prio, n, slope_num, slope_den,
        |       CAST(slope_num AS DOUBLE) / CAST(slope_den AS DOUBLE)
        |         AS slope,
        |       (CAST(sy AS DOUBLE)
        |         - (CAST(slope_num AS DOUBLE) / CAST(slope_den AS DOUBLE))
        |           * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |         AS intercept
        |FROM sl ORDER BY prio""".stripMargin,
    "funnel_latency" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, date_trunc('second', ts) AS ts
        |  FROM events
        |), v AS (
        |  SELECT user_id, min(ts) AS tv FROM ev
        |  WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS tc
        |  FROM ev e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.tv GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS tp
        |  FROM ev e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.tc GROUP BY 1
        |), lat AS (
        |  SELECT 'view_to_click' AS stage,
        |         CAST(epoch(c.tc) - epoch(v.tv) AS BIGINT) AS lat
        |  FROM c JOIN v USING (user_id)
        |  UNION ALL
        |  SELECT 'click_to_purchase',
        |         CAST(epoch(p.tp) - epoch(c.tc) AS BIGINT)
        |  FROM p JOIN c USING (user_id)
        |), r AS (
        |  SELECT stage, lat,
        |         row_number() OVER (PARTITION BY stage ORDER BY lat)
        |           AS rn,
        |         count(*) OVER (PARTITION BY stage) AS n
        |  FROM lat
        |)
        |SELECT stage, CAST(max(n) AS BIGINT) AS n,
        |       min(lat) AS min_s,
        |       max(CASE WHEN rn = (n + 1) // 2 THEN lat END) AS p50_s,
        |       max(CASE WHEN rn = (9 * n + 9) // 10 THEN lat END)
        |         AS p90_s,
        |       max(lat) AS max_s
        |FROM r GROUP BY stage ORDER BY stage""".stripMargin,
    "event_ngrams" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type AS t1,
        |         date_trunc('second', ts) AS ts
        |  FROM events
        |), tri AS (
        |  SELECT t1,
        |         lead(t1, 1) OVER w AS t2,
        |         lead(t1, 2) OVER w AS t3
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT t1, t2, t3, count(*) AS n FROM tri
        |WHERE t3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin,
    "theilsen_trend" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         CAST(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |           AS BIGINT) // 100000 AS BIGINT) AS y,
        |         CAST(datediff('day', DATE '1995-01-01',
        |           CAST(o_orderdate AS DATE)) AS BIGINT) AS t
        |  FROM orders GROUP BY 1
        |), sh AS (
        |  SELECT d.y AS ya, d.t AS ta, g.gap, d.t + g.gap AS t
        |  FROM daily d
        |  CROSS JOIN (SELECT unnest(generate_series(1, 30)) AS gap) g
        |), slopes AS (
        |  SELECT CAST(CASE WHEN b.y >= s.ya THEN 1 ELSE -1 END
        |    * ((1000 * abs(b.y - s.ya)) // s.gap) AS BIGINT)
        |    AS slope_milli
        |  FROM sh s JOIN daily b ON b.t = s.t
        |), r AS (
        |  SELECT slope_milli,
        |         CAST(row_number() OVER (ORDER BY slope_milli)
        |           AS BIGINT) AS rn,
        |         CAST(count(*) OVER () AS BIGINT) AS n_pairs
        |  FROM slopes
        |)
        |SELECT n_pairs,
        |       CAST(max(CASE WHEN rn = (n_pairs + 1) // 4
        |         THEN slope_milli END) AS BIGINT) AS q1_slope_milli,
        |       CAST(max(CASE WHEN rn = (n_pairs + 1) // 2
        |         THEN slope_milli END) AS BIGINT)
        |         AS median_slope_milli,
        |       CAST(max(CASE WHEN rn = (3 * (n_pairs + 1)) // 4
        |         THEN slope_milli END) AS BIGINT) AS q3_slope_milli
        |FROM r
        |WHERE rn IN ((n_pairs + 1) // 4, (n_pairs + 1) // 2,
        |             (3 * (n_pairs + 1)) // 4)
        |GROUP BY n_pairs""".stripMargin,
    "dow_anomaly" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS d,
        |         CAST(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |           AS BIGINT) // 100000 AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), dd AS (
        |  SELECT d, y, CAST(dayofweek(d) + 1 AS BIGINT) AS dow
        |  FROM daily
        |), st AS (
        |  SELECT dow, count(*) AS n,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM dd GROUP BY 1
        |)
        |SELECT strftime(dd.d, '%Y-%m-%d') AS day, dd.dow, dd.y,
        |       CAST(st.n * dd.y - st.sy AS BIGINT) AS dev,
        |       CAST(st.n * st.syy - st.sy * st.sy AS BIGINT)
        |         AS var_num,
        |       CAST(1000000 * ((st.n * dd.y - st.sy)
        |           * (st.n * dd.y - st.sy))
        |         // (st.n * st.syy - st.sy * st.sy) AS BIGINT)
        |         AS z2_ppm
        |FROM dd JOIN st ON st.dow = dd.dow
        |ORDER BY z2_ppm DESC, day LIMIT 10""".stripMargin,
    "dow_anomaly_wide" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS d,
        |         CAST(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |           AS BIGINT) // 100000 AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), dd AS (
        |  SELECT d, y, CAST(dayofweek(d) + 1 AS BIGINT) AS dow
        |  FROM daily
        |), st AS (
        |  SELECT dow, count(*) AS n,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM dd GROUP BY 1
        |)
        |SELECT strftime(dd.d, '%Y-%m-%d') AS day, dd.dow, dd.y,
        |       CAST(st.n * dd.y - st.sy AS BIGINT) AS dev,
        |       CAST(st.n * st.syy - st.sy * st.sy AS BIGINT)
        |         AS var_num,
        |       CAST((CAST(1000000 AS HUGEINT)
        |           * CAST(st.n * dd.y - st.sy AS HUGEINT)
        |           * CAST(st.n * dd.y - st.sy AS HUGEINT))
        |         // CAST(st.n * st.syy - st.sy * st.sy AS HUGEINT)
        |         AS BIGINT) AS z2_ppm
        |FROM dd JOIN st ON st.dow = dd.dow
        |ORDER BY z2_ppm DESC, day LIMIT 10""".stripMargin,
    "acf_daily" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         CAST(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |           AS BIGINT) // 100000 AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), srs AS (
        |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT)
        |           AS rn, y
        |  FROM daily
        |), prs AS (
        |  SELECT g.k AS lag, a.y AS ya, b.y AS yb
        |  FROM srs a
        |  CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS k) g
        |  JOIN srs b ON b.rn = a.rn + g.k
        |)
        |SELECT CAST(lag AS BIGINT) AS lag, count(*) AS n,
        |       CAST(count(*) * sum(ya*yb) - sum(ya) * sum(yb)
        |         AS BIGINT) AS num,
        |       CAST(count(*) * sum(ya*ya) - sum(ya) * sum(ya)
        |         AS BIGINT) AS den1,
        |       CAST(count(*) * sum(yb*yb) - sum(yb) * sum(yb)
        |         AS BIGINT) AS den2
        |FROM prs GROUP BY 1 ORDER BY lag""".stripMargin,
    "reach_curve" ->
      """WITH fs AS (
        |  SELECT user_id,
        |         min(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000)
        |           AS first_day
        |  FROM events GROUP BY 1
        |), nd AS (
        |  SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new
        |  FROM fs GROUP BY 1
        |), cal AS (
        |  SELECT DISTINCT
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |           AS day
        |  FROM events
        |)
        |SELECT CAST(c.day AS BIGINT) AS day,
        |       CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new,
        |       CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY c.day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS cum_users
        |FROM cal c LEFT JOIN nd n ON c.day = n.day
        |ORDER BY day""".stripMargin,
    "user_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |           AS day
        |  FROM events
        |), isl AS (
        |  SELECT user_id, day,
        |         day - dense_rank() OVER (PARTITION BY user_id
        |           ORDER BY day) AS grp
        |  FROM days
        |), runs AS (
        |  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
        |         CAST(min(day) AS BIGINT) AS start_day
        |  FROM isl GROUP BY 1, 2
        |), best AS (
        |  SELECT user_id, len, start_day,
        |         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
        |           AS n_streaks,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY len DESC, start_day ASC) AS rn
        |  FROM runs
        |)
        |SELECT user_id, len AS longest_streak,
        |       start_day AS streak_start_day, n_streaks
        |FROM best WHERE rn = 1
        |ORDER BY longest_streak DESC, user_id LIMIT 20""".stripMargin,
    "share_of_parent" ->
      """WITH leaf AS (
        |  SELECT n.n_regionkey, n.n_name,
        |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |           AS BIGINT) AS cents
        |  FROM customer c
        |  JOIN orders o ON c.c_custkey = o.o_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2
        |), wins AS (
        |  SELECT CAST(n_regionkey AS BIGINT) AS regionkey,
        |         n_name AS nation, cents,
        |         CAST(sum(cents) OVER (PARTITION BY n_regionkey)
        |           AS BIGINT) AS region_cents,
        |         CAST(sum(cents) OVER () AS BIGINT) AS total_cents
        |  FROM leaf
        |)
        |SELECT regionkey, nation, cents,
        |       CAST(1000000 * cents // region_cents AS BIGINT)
        |         AS share_of_region_ppm,
        |       CAST(1000000 * region_cents // total_cents AS BIGINT)
        |         AS region_share_ppm
        |FROM wins ORDER BY regionkey, nation""".stripMargin,
    "funnel_windowed" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        |  FROM events
        |), qc AS (
        |  SELECT DISTINCT c.event_id AS click_id, c.user_id,
        |         c.tus AS click_tus
        |  FROM ev c JOIN ev v
        |    ON v.user_id = c.user_id AND v.event_type = 'view'
        |   AND v.tus > c.tus - 86400000000 AND v.tus <= c.tus
        |  WHERE c.event_type = 'click'
        |), qp AS (
        |  SELECT DISTINCT p.event_id AS purchase_id, p.user_id
        |  FROM ev p JOIN qc q
        |    ON q.user_id = p.user_id
        |   AND q.click_tus > p.tus - 86400000000
        |   AND q.click_tus <= p.tus
        |  WHERE p.event_type = 'purchase'
        |)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM qc)
        |    AS n_qualified_clicks,
        |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM qc)
        |    AS n_click_users,
        |  (SELECT CAST(count(*) AS BIGINT) FROM qp)
        |    AS n_qualified_purchases,
        |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM qp)
        |    AS n_purchase_users""".stripMargin,
    "order_aging" ->
      """WITH ls AS (
        |  SELECT l_orderkey, max(l_shipdate) AS last_ship
        |  FROM lineitem GROUP BY 1
        |), open_o AS (
        |  SELECT o.*,
        |         datediff('day', CAST(o.o_orderdate AS DATE),
        |                  DATE '1998-01-01') AS days_open
        |  FROM orders o JOIN ls ON o.o_orderkey = ls.l_orderkey
        |  WHERE o.o_orderdate <= TIMESTAMP '1998-01-01'
        |    AND ls.last_ship > TIMESTAMP '1998-01-01'
        |)
        |SELECT CASE WHEN days_open <= 30 THEN 'a_0_30'
        |            WHEN days_open <= 90 THEN 'b_31_90'
        |            WHEN days_open <= 365 THEN 'c_91_365'
        |            ELSE 'd_365_plus' END AS band,
        |       CAST(count(*) AS BIGINT) AS n_open,
        |       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |         AS BIGINT) AS open_cents,
        |       CAST(min(days_open) AS BIGINT) AS min_days,
        |       CAST(max(days_open) AS BIGINT) AS max_days
        |FROM open_o GROUP BY 1 ORDER BY band""".stripMargin,
    "corr_matrix" ->
      """WITH m AS (
        |  SELECT l_orderkey,
        |         CAST(count(*) AS BIGINT) AS m_lines,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |           AS m_qty,
        |         CAST(sum(CAST(round(l_discount*100) AS BIGINT))
        |           AS BIGINT) AS m_disc,
        |         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |           // 100000) AS BIGINT) AS m_price
        |  FROM lineitem GROUP BY 1
        |), t AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(m_lines) AS BIGINT) AS s_m_lines,
        |    CAST(sum(m_qty) AS BIGINT) AS s_m_qty,
        |    CAST(sum(m_disc) AS BIGINT) AS s_m_disc,
        |    CAST(sum(m_price) AS BIGINT) AS s_m_price,
        |    CAST(sum(m_lines*m_lines) AS BIGINT) AS ss_m_lines,
        |    CAST(sum(m_qty*m_qty) AS BIGINT) AS ss_m_qty,
        |    CAST(sum(m_disc*m_disc) AS BIGINT) AS ss_m_disc,
        |    CAST(sum(m_price*m_price) AS BIGINT) AS ss_m_price,
        |    CAST(sum(m_lines*m_qty) AS BIGINT) AS sp_lines_qty,
        |    CAST(sum(m_lines*m_disc) AS BIGINT) AS sp_lines_disc,
        |    CAST(sum(m_lines*m_price) AS BIGINT) AS sp_lines_price,
        |    CAST(sum(m_qty*m_disc) AS BIGINT) AS sp_qty_disc,
        |    CAST(sum(m_qty*m_price) AS BIGINT) AS sp_qty_price,
        |    CAST(sum(m_disc*m_price) AS BIGINT) AS sp_disc_price
        |  FROM m
        |)
        |SELECT metric_a, metric_b,
        |       CAST(num AS BIGINT) AS num,
        |       CAST(den_a AS BIGINT) AS den_a,
        |       CAST(den_b AS BIGINT) AS den_b
        |FROM (
        |  SELECT 'm_lines' AS metric_a, 'm_disc' AS metric_b,
        |         n*sp_lines_disc - s_m_lines*s_m_disc AS num,
        |         n*ss_m_lines - s_m_lines*s_m_lines AS den_a,
        |         n*ss_m_disc - s_m_disc*s_m_disc AS den_b
        |  FROM t
        |  UNION ALL
        |  SELECT 'm_lines', 'm_price',
        |         n*sp_lines_price - s_m_lines*s_m_price,
        |         n*ss_m_lines - s_m_lines*s_m_lines,
        |         n*ss_m_price - s_m_price*s_m_price
        |  FROM t
        |  UNION ALL
        |  SELECT 'm_lines', 'm_qty',
        |         n*sp_lines_qty - s_m_lines*s_m_qty,
        |         n*ss_m_lines - s_m_lines*s_m_lines,
        |         n*ss_m_qty - s_m_qty*s_m_qty
        |  FROM t
        |  UNION ALL
        |  SELECT 'm_qty', 'm_disc',
        |         n*sp_qty_disc - s_m_qty*s_m_disc,
        |         n*ss_m_qty - s_m_qty*s_m_qty,
        |         n*ss_m_disc - s_m_disc*s_m_disc
        |  FROM t
        |  UNION ALL
        |  SELECT 'm_qty', 'm_price',
        |         n*sp_qty_price - s_m_qty*s_m_price,
        |         n*ss_m_qty - s_m_qty*s_m_qty,
        |         n*ss_m_price - s_m_price*s_m_price
        |  FROM t
        |  UNION ALL
        |  SELECT 'm_disc', 'm_price',
        |         n*sp_disc_price - s_m_disc*s_m_price,
        |         n*ss_m_disc - s_m_disc*s_m_disc,
        |         n*ss_m_price - s_m_price*s_m_price
        |  FROM t
        |) u ORDER BY metric_a, metric_b""".stripMargin,
    "pattern_vshape" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |           AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), l AS (
        |  SELECT day, y,
        |         lag(y, 2) OVER (ORDER BY day) AS p2,
        |         lag(y, 1) OVER (ORDER BY day) AS p1,
        |         lead(y, 1) OVER (ORDER BY day) AS n1,
        |         lead(y, 2) OVER (ORDER BY day) AS n2
        |  FROM daily
        |)
        |SELECT strftime(day, '%Y-%m-%d') AS day, y,
        |       CAST(p1 - y + n1 - y AS BIGINT) AS depth_cents
        |FROM l
        |WHERE p2 > p1 AND p1 > y AND y < n1 AND n1 < n2
        |ORDER BY day""".stripMargin,
    "monthly_yoy" ->
      """WITH monthly AS (
        |  SELECT date_trunc('month', o_orderdate) AS month_d,
        |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |           AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), l AS (
        |  SELECT m.month_d, m.y, pm.y AS prev_m, py.y AS prev_y
        |  FROM monthly m
        |  LEFT JOIN monthly pm
        |    ON pm.month_d = m.month_d - INTERVAL 1 MONTH
        |  LEFT JOIN monthly py
        |    ON py.month_d = m.month_d - INTERVAL 12 MONTH
        |)
        |SELECT strftime(month_d, '%Y-%m') AS month, y,
        |       CAST(CASE WHEN y >= prev_m THEN 1 ELSE -1 END
        |         * ((1000000 * abs(y - prev_m)) // prev_m)
        |         AS BIGINT) AS mom_ppm,
        |       CAST(CASE WHEN y >= prev_y THEN 1 ELSE -1 END
        |         * ((1000000 * abs(y - prev_y)) // prev_y)
        |         AS BIGINT) AS yoy_ppm
        |FROM l ORDER BY month""".stripMargin,
    "monthly_yoy_gapped" ->
      """WITH monthly0 AS (
        |  SELECT date_trunc('month', o_orderdate) AS month_d,
        |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |           AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), monthly AS (
        |  SELECT * FROM monthly0
        |  WHERE strftime(month_d, '%Y-%m') <> '1995-06'
        |), l AS (
        |  SELECT m.month_d, m.y, pm.y AS prev_m, py.y AS prev_y
        |  FROM monthly m
        |  LEFT JOIN monthly pm
        |    ON pm.month_d = m.month_d - INTERVAL 1 MONTH
        |  LEFT JOIN monthly py
        |    ON py.month_d = m.month_d - INTERVAL 12 MONTH
        |)
        |SELECT strftime(month_d, '%Y-%m') AS month, y,
        |       CAST(CASE WHEN y >= prev_m THEN 1 ELSE -1 END
        |         * ((1000000 * abs(y - prev_m)) // prev_m)
        |         AS BIGINT) AS mom_ppm,
        |       CAST(CASE WHEN y >= prev_y THEN 1 ELSE -1 END
        |         * ((1000000 * abs(y - prev_y)) // prev_y)
        |         AS BIGINT) AS yoy_ppm
        |FROM l ORDER BY month""".stripMargin,
    "ab_proportion_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |         CASE WHEN sum(CASE WHEN event_type = 'purchase'
        |           THEN 1 ELSE 0 END) >= 14 THEN 1 ELSE 0 END
        |           AS conv,
        |         user_id % 2 AS arm
        |  FROM events GROUP BY user_id
        |), t AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)
        |      AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n2,
        |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)
        |      AS BIGINT) AS c2
        |  FROM u
        |)
        |SELECT n1, c1, n2, c2,
        |       CAST((1000 * ((c1*n2 - c2*n1) * (c1*n2 - c2*n1)
        |           * (n1 + n2)))
        |         // (n1 * n2 * (c1 + c2) * (n1 + n2 - c1 - c2))
        |         AS BIGINT) AS z2_milli
        |FROM t""".stripMargin
  )
}
