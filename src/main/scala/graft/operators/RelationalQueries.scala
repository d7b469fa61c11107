package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** General relational operator coverage over the star schema
  * (SURVEY.md §2b, §7.2 item 1): the full join family, aggregate
  * family, window family, sorts/top-K and set operations — each as a
  * registered query with a DuckDB oracle.
  *
  * Scale conventions (these run unchanged on a 1000-executor cluster):
  *   - dimension tables (region/nation/customer/part/supplier) join via
  *     `broadcast()` — no shuffle of the fact side;
  *   - fact⋈fact joins (lineitem⋈orders) shuffle on the join key and
  *     are AQE-planned (sort-merge at scale, shuffled-hash when a side
  *     is small);
  *   - every money aggregate is integer CENTS (round(x*100) per row,
  *     then a long sum): deterministic under any partitioning/order —
  *     a double sum's value depends on reduction order and would flake
  *     the oracle hash (and at 100 TB, any cross-run comparison);
  *   - every query output is totally ordered by explicit tiebreaks.
  */
object RelationalQueries {

  /** round-half-away-from-zero(x*100) as long — exact for 2-decimal
    * money stored as double (the *100 product is never exactly at .5).
    */
  private def cents(c: Column): Column = Money.cents(c)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Broadcast hash join: fact orders ⋈ broadcast dim customer.
    "join_broadcast" -> ((s, d) =>
      orders(s, d)
        .join(broadcast(customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("revenue_cents"))
        .orderBy("c_mktsegment")),

    // Shuffle join of the two fact tables (sort-merge / AQE's pick).
    "join_shuffle" -> ((s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          sum(cents(col("l_extendedprice"))).as("extprice_cents"))
        .orderBy("o_orderpriority")),

    // 5-way star join: facts shuffle once, all dims broadcast.
    "join_multiway" -> ((s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          count(lit(1)).as("n_items"),
          sum(cents(col("l_extendedprice"))).as("revenue_cents"))
        .orderBy("r_name")),

    // Left outer join preserving customers with zero orders, folded
    // into an order-count histogram.
    "join_left_outer" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy("n_orders")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("n_orders")),

    // Left semi join: customers with at least one order.
    "join_semi" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"),
          "left_semi")
        .agg(count(lit(1)).as("n_customers_with_orders"))),

    // Left anti join: customers with no orders.
    "join_anti" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .agg(
          count(lit(1)).as("n_customers_without_orders"),
          coalesce(min(col("c_custkey")), lit(-1L)).as("min_custkey"))),

    // Equi join + non-equi range predicate (ships >60 days after order).
    "join_range" -> ((s, d) =>
      lineitem(s, d)
        .join(
          orders(s, d),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .agg(count(lit(1)).as("n_late_items"))),

    // TPC-H Q1-shaped aggregate family over lineitem.
    "agg_pricing" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_cents"),
          sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_price_cents"),
          min(cents(col("l_extendedprice"))).as("min_price_cents"),
          max(cents(col("l_extendedprice"))).as("max_price_cents"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Distinct aggregate: distinct customers per order priority.
    "agg_count_distinct" -> ((s, d) =>
      orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          countDistinct(col("o_custkey")).as("n_custs"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")),

    // Exact mean via one division over deterministic integer inputs
    // (sum of cents / count) — no order-dependent double accumulation.
    "agg_avg" -> ((s, d) =>
      customer(s, d)
        .groupBy("c_mktsegment")
        .agg(
          (sum(cents(col("c_acctbal"))).cast("double") / count(lit(1)))
            .as("avg_acctbal_cents"),
          count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")),

    // Hierarchical rollup region → nation over the customer dim —
    // expressed through the SQL surface (Spark 4.1's ambiguity detector
    // false-positives on DataFrame-API rollup over a multi-join here).
    "agg_rollup" -> ((s, d) => {
      customer(s, d).createOrReplaceTempView("customer_v")
      broadcast(nation(s, d)).createOrReplaceTempView("nation_v")
      broadcast(region(s, d)).createOrReplaceTempView("region_v")
      s.sql(
        """SELECT r_name, n_name,
          |       count(*) AS n_customers,
          |       sum(CAST(round(c_acctbal*100) AS BIGINT)) AS acctbal_cents
          |FROM customer_v
          |JOIN nation_v ON c_nationkey = n_nationkey
          |JOIN region_v ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST"""
          .stripMargin)
    }),

    // Full cube over the lineitem flags.
    "agg_cube" -> ((s, d) =>
      lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"))
        .orderBy(
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // row_number: latest order per customer (top-1-per-group pattern).
    "window_rownum" -> ((s, d) => {
      val w = Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("o_custkey"),
          col("o_orderkey").as("latest_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_date"))
        .orderBy("o_custkey")
    }),

    // rank vs dense_rank: 3 priciest parts per brand, ties kept.
    "window_rank" -> ((s, d) => {
      val w = Window
        .partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      part(s, d)
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rnk") <= 3)
        .select(col("p_brand"), col("p_partkey"), col("rnk"), col("drnk"))
        .orderBy("p_brand", "rnk", "p_partkey")
    }),

    // lag: days between consecutive orders of a customer, summed per
    // market segment (single-division mean avoided entirely: int sums).
    "window_lag" -> ((s, d) => {
      val w = Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      orders(s, d)
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev_date").isNotNull)
        .withColumn("gap_days",
          datediff(col("o_orderdate"), col("prev_date")).cast("long"))
        .join(broadcast(customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          sum(col("gap_days")).as("sum_gap_days"),
          count(lit(1)).as("n_gaps"))
        .orderBy("c_mktsegment")
    }),

    // Blocked fuzzy match (entity-resolution shape): Levenshtein ≤ 12
    // between distinct part names sharing a 4-char prefix block. The
    // block key turns pair generation into a key-equi shuffle join —
    // within-block pairs only, the standard ER trade-off that keeps
    // the operator linear-ish in block sizes instead of all-pairs.
    "fuzzy_match" -> ((s, d) =>
      Fuzzy.blockedPairs(
        part(s, d)
          .filter(col("p_partkey") <= 300)
          .select(col("p_name").as("t")),
        blockLen = 4,
        maxDist = 12)),

    // lead + first_value: next order date and first-order price per
    // customer — the remaining window functions not covered above.
    "window_lead_first" -> ((s, d) => {
      val w = Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d)
        .filter(col("o_custkey") < 50)
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          date_format(lead(col("o_orderdate"), 1).over(w), "yyyy-MM-dd")
            .as("next_date"),
          first(cents(col("o_totalprice"))).over(wf).as("first_cents"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Explicit frame: running revenue per customer over order history.
    "window_running_sum" -> ((s, d) => {
      val w = Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d)
        .filter(col("o_custkey") < 50)
        .withColumn("running_cents", sum(cents(col("o_totalprice"))).over(w))
        .select(
          col("o_custkey"), col("o_orderkey"), col("running_cents"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ntile quartiles over a totally-ordered ranking — WITHOUT the
    // single-partition WindowExec an unpartitioned `ntile(4).over`
    // would plan (every row through one task). Global positions come
    // from GlobalRank (range shuffle + per-partition offsets, all
    // stages parallel); the bucket is then a pure per-row formula
    // from (rn, n) replicating NTILE semantics exactly: n mod k
    // leading buckets get ceil(n/k) rows, the rest floor(n/k).
    "window_ntile" -> ((s, d) => {
      val base = customer(s, d).select(col("c_acctbal"), col("c_custkey"))
      val ranked = GlobalRank.withRowNumber(
        base, Seq(col("c_acctbal").asc, col("c_custkey").asc))
      // The row count joins in as a broadcast scalar (1 row), keeping
      // the whole query lazy — nothing executes at construction time.
      val nRow = base.agg(count(lit(1)).as("n"))
      ranked
        .crossJoin(broadcast(nRow))
        .withColumn(
          "quartile",
          expr(
            """CASE
              |  WHEN n div 4 = 0 THEN rn
              |  WHEN rn <= (n % 4) * (n div 4 + 1)
              |    THEN (rn - 1) div (n div 4 + 1) + 1
              |  ELSE n % 4 + (rn - 1 - (n % 4) * (n div 4 + 1))
              |         div (n div 4) + 1
              |END""".stripMargin).cast("int"))
        .groupBy("quartile")
        .agg(
          count(lit(1)).as("n_customers"),
          sum(cents(col("c_acctbal"))).as("acctbal_cents"))
        .orderBy("quartile")
    }),

    // SCD type-2 build: collapse each user's event stream into
    // validity intervals of their event_type — a row starts a period
    // when the type CHANGES (or at first sight), valid_to is the next
    // period's start, the open period gets the sentinel. Two stacked
    // windows, both partitioned by user — parallel at any scale.
    "scd2_intervals" -> ((s, d) => {
      val w = Window
        .partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val starts = events(s, d)
        .filter(col("user_id") < 50)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(
          col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
      starts
        .withColumn(
          "valid_from",
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
        .withColumn(
          "valid_to",
          coalesce(
            date_format(lead(col("ts"), 1).over(w), "yyyy-MM-dd HH:mm:ss"),
            lit("9999-12-31 00:00:00")))
        .select(
          col("user_id"), col("event_id"), col("event_type"),
          col("valid_from"), col("valid_to"))
        .orderBy("user_id", "valid_from", "event_id")
    }),

    // SCD2 AS-OF LOOKUP — the consumer side of scd2_intervals: each
    // fact (purchase) resolves the dimension version VALID AT its
    // timestamp, the effective-dated join every versioned-dimension
    // warehouse runs. The dimension is the user's BROWSING regime
    // (non-purchase events only — versioning the fact's own event
    // type would make every lookup resolve to itself). The join is key-equi on the entity (user) with
    // the [valid_from, valid_to) containment as a join predicate —
    // versions-per-entity is bounded by regime changes, so the
    // per-key fan-out stays small at any history length, and interval
    // partitioning guarantees EXACTLY one version matches each fact
    // (an unmatched or doubly-matched fact breaks the row count).
    "scd2_asof_lookup" -> ((s, d) => {
      val w = Window
        .partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val dim = events(s, d)
        .filter(col("user_id") < 50 && col("event_type") =!= "purchase")
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(
          col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
        // Micros integers for the containment bounds: type-proof
        // across both ts encodings the fixtures have shipped (LTZ
        // micros and NTZ), per the tsMicros convention.
        .withColumn("valid_from_us", graft.Tables.tsMicros(col("ts")))
        .withColumn(
          "valid_to_us",
          coalesce(
            graft.Tables.tsMicros(lead(col("ts"), 1).over(w)),
            lit(Long.MaxValue)))
        .select(
          col("user_id").as("d_user"), col("event_type").as("regime"),
          col("valid_from_us"), col("valid_to_us"))
      events(s, d)
        .filter(col("user_id") < 50 && col("event_type") === "purchase")
        .withColumn("tus", graft.Tables.tsMicros(col("ts")))
        .join(dim,
          col("user_id") === col("d_user") &&
            col("tus") >= col("valid_from_us") &&
            col("tus") < col("valid_to_us"))
        .groupBy("regime")
        .agg(
          count(lit(1)).as("n_purchases"),
          countDistinct(col("user_id")).as("n_users"),
          sum(cents(col("value"))).as("cents"))
        .orderBy("regime")
    }),

    // RANGE frame (value-based, vs the ROWS frame in
    // window_running_sum): rolling 30-day order revenue per customer.
    // The frame bound is an integer day offset, so peer handling and
    // boundaries are exact in both engines.
    "window_range_frame" -> ((s, d) => {
      val w = Window
        .partitionBy("o_custkey")
        .orderBy(col("day_epoch"))
        .rangeBetween(-30, 0)
      orders(s, d)
        .filter(col("o_custkey") < 30)
        .withColumn(
          "day_epoch",
          datediff(to_date(col("o_orderdate")), lit("1990-01-01").cast("date"))
            .cast("long"))
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
          count(lit(1)).over(w).as("n_30d"),
          sum(cents(col("o_totalprice"))).over(w).as("cents_30d"),
          col("day_epoch"))
        .orderBy("o_custkey", "day_epoch", "o_orderkey")
        .drop("day_epoch")
    }),

    // Exact interpolated quantiles per group (percentile ≡ DuckDB
    // quantile_cont: rank (n-1)*p + linear interpolation — every
    // input is exact integer cents, so the interpolation arithmetic
    // is single IEEE ops, bit-deterministic).
    "agg_median" -> ((s, d) =>
      orders(s, d)
        .select(
          col("o_orderpriority"),
          cents(col("o_totalprice")).as("cents"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          expr("percentile(cents, 0.25)").as("q1_cents"),
          expr("percentile(cents, 0.5)").as("median_cents"),
          expr("percentile(cents, 0.75)").as("q3_cents"))
        .orderBy("o_orderpriority")),

    // IGNORE NULLS window navigation — first_value / last_value /
    // nth_value skipping the gaps a sparse column carries (order
    // status nulled for 'F' rows simulates sparsity): the
    // carry-forward/backward primitives ts_interpolate composes,
    // exposed as their own pinned surface. Frames and total order
    // fixed, so the picked values are exact in both engines.
    "window_ignore_nulls" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
      orders(s, d)
        .filter(col("o_custkey") <= 30)
        .withColumn("sparse_status",
          when(col("o_orderstatus") === "F", lit(null))
            .otherwise(col("o_orderstatus")))
        .select(
          col("o_custkey"), col("o_orderkey"),
          first(col("sparse_status"), ignoreNulls = true).over(w)
            .as("first_nn"),
          last(col("sparse_status"), ignoreNulls = true).over(w)
            .as("last_nn"),
          nth_value(col("sparse_status"), 2, ignoreNulls = true)
            .over(w).as("second_nn"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Discrete percentile — percentile_disc returns an ACTUAL data
    // value (the value at ceil-rank), never an interpolation, which
    // is what makes it hash-gateable without the float caveats the
    // continuous form needs. p25/p50/p75 of order cents per
    // priority. Spark's percentile_disc yields DOUBLE even for
    // integral input, so each quantile is CAST back to BIGINT (exact:
    // the value is one of the long cent inputs) to match the oracle's
    // type-sensitive hash.
    "agg_percentile_disc" -> ((s, d) => {
      orders(s, d)
        .select(col("o_orderpriority"),
          cents(col("o_totalprice")).as("v"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          expr(
            "CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY v)" +
              " AS BIGINT)").as("p25_cents"),
          expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v)" +
              " AS BIGINT)").as("p50_cents"),
          expr(
            "CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY v)" +
              " AS BIGINT)").as("p75_cents"))
        .orderBy("o_orderpriority")
    }),

    // Continuous percentile — the interpolating companion
    // (percentile_cont / quantile_cont), the form SQL users reach for
    // first. Both engines use the same rank convention
    // rn = p·(n−1) with linear interpolation, and for quartile
    // probabilities the fractional rank is always a dyadic quarter,
    // so 4× the interpolated cent value is an EXACT integer in both
    // engines — the float caveat is handled the repo's usual way by
    // reporting quarter-cents as BIGINT (round(4·q) — exact, no
    // tolerance needed) instead of hash-gating raw doubles.
    "agg_percentile_cont" -> ((s, d) => {
      orders(s, d)
        .select(col("o_orderpriority"),
          cents(col("o_totalprice")).as("v"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          expr(
            "CAST(round(4 * (percentile_cont(0.25)" +
              " WITHIN GROUP (ORDER BY v))) AS BIGINT)")
            .as("p25_qcents"),
          expr(
            "CAST(round(4 * (percentile_cont(0.5)" +
              " WITHIN GROUP (ORDER BY v))) AS BIGINT)")
            .as("p50_qcents"),
          expr(
            "CAST(round(4 * (percentile_cont(0.75)" +
              " WITHIN GROUP (ORDER BY v))) AS BIGINT)")
            .as("p75_qcents"))
        .orderBy("o_orderpriority")
    }),

    // Boolean & bitwise aggregate surface — count_if / bool_and /
    // bool_or and the bit_and/or/xor fold family, the flag-rollup
    // shapes permission masks and feature-flag audits use. Operands
    // derive from the JSON props field (k mod 16 as a 4-bit flag
    // word) so the bit folds see varied masks; every aggregate is
    // order-independent, so the rollup is partition-proof by
    // construction.
    "agg_bool_bit" -> ((s, d) =>
      events(s, d)
        .select(
          col("event_type"),
          col("value"),
          (get_json_object(col("props"), "$.k").cast("long") % 16)
            .as("flags"))
        .groupBy("event_type")
        .agg(
          count_if(col("value") > 15.0).as("n_high"),
          bool_and(col("value") > 0.0).as("all_positive"),
          bool_or(col("value") > 19.0).as("any_extreme"),
          bit_and(col("flags")).as("flags_and"),
          bit_or(col("flags")).as("flags_or"),
          bit_xor(col("flags")).as("flags_xor"))
        .orderBy("event_type")),

    // Exact WEIGHTED median — "half the segment's ORDERS come from
    // customers with balance ≤ X" (agg_median's percentile() weights
    // every row equally; business medians usually weight by volume).
    // Per customer one (balance, order-count) row; per segment a
    // cumulative-weight window over the (cents, custkey) total order
    // picks the first row where 2·cumw ≥ totw — the lower weighted
    // median, exact integers throughout. Windows run over the
    // per-customer aggregated frame (the revenue_gini scale caveat:
    // row-scale but 5-way partitioned; the GlobalRank range scheme
    // is the documented swap past that).
    "weighted_median" -> ((s, d) => {
      val perCust = customer(s, d)
        .join(orders(s, d),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_mktsegment"),
          cents(col("c_acctbal")).as("bal_cents"))
        .agg(count(col("o_orderkey")).as("w"))
      val wOrd = Window.partitionBy("c_mktsegment")
        .orderBy(col("bal_cents"), col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy("c_mktsegment")
      perCust
        .withColumn("cumw", sum(col("w")).over(wOrd))
        .withColumn("totw", sum(col("w")).over(wTot))
        .filter(col("cumw") * 2 >= col("totw"))
        .groupBy(col("c_mktsegment"))
        .agg(
          min_by(
            struct(col("bal_cents"), col("cumw"), col("totw")),
            struct(col("bal_cents"), col("c_custkey"))).as("m"))
        .select(
          col("c_mktsegment"),
          col("m.bal_cents").as("wmedian_bal_cents"),
          col("m.cumw").as("cum_orders"),
          col("m.totw").as("total_orders"))
        .orderBy("c_mktsegment")
    }),

    // Top-K: plans as TakeOrderedAndProject (per-partition heap, no
    // full sort) — the scale-safe form of ORDER BY + LIMIT.
    "topk_orders" -> ((s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          cents(col("o_totalprice")).as("totalprice_cents"))
        .orderBy(col("totalprice_cents").desc, col("o_orderkey").asc)
        .limit(10)),

    // Set ops: nations that have customers vs nations that have
    // suppliers. Each fact side collapses to its distinct nationkeys
    // BEFORE touching nation, so the INTERSECT/EXCEPT and the name
    // join operate on ≤25-row inputs at any scale — the map-side
    // partial distinct means the only fact-sized work is one
    // combine-then-shuffle of keys, never fact-sized join output.
    "setop_intersect" -> ((s, d) =>
      customer(s, d)
        .select(col("c_nationkey").as("nationkey")).distinct()
        .intersect(
          supplier(s, d)
            .select(col("s_nationkey").as("nationkey")).distinct())
        .join(broadcast(nation(s, d)),
          col("nationkey") === col("n_nationkey"))
        .select("n_name")
        .orderBy("n_name")),

    "setop_except" -> ((s, d) =>
      customer(s, d)
        .select(col("c_nationkey").as("nationkey")).distinct()
        .except(
          supplier(s, d)
            .select(col("s_nationkey").as("nationkey")).distinct())
        .join(broadcast(nation(s, d)),
          col("nationkey") === col("n_nationkey"))
        .select("n_name")
        .orderBy("n_name")),

    "setop_union" -> ((s, d) =>
      customer(s, d)
        .select(col("c_nationkey").as("nationkey"))
        .union(supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .agg(
          count(lit(1)).as("n_rows_union_all"),
          countDistinct(col("nationkey")).as("n_distinct"))),

    "distinct_segments" -> ((s, d) =>
      customer(s, d)
        .select("c_mktsegment")
        .distinct()
        .orderBy("c_mktsegment")),

    // Windowed DISTINCT count — an aggregate Spark's window functions
    // refuse (COUNT(DISTINCT) OVER is unsupported) — composed as the
    // SCALE-SAFE equivalent: one partial-aggregating countDistinct per
    // partition key, joined back to the rows (AQE broadcasts the tiny
    // aggregate side). A collect_set-over-window would carry one
    // set buffer PER ROW; this form carries one count per KEY. The
    // oracle runs DuckDB's native COUNT(DISTINCT) OVER, pinning the
    // composition to the real windowed semantics.
    "window_count_distinct" -> ((s, d) => {
      val base = orders(s, d)
        .filter(col("o_orderkey") <= 1000)
        .select("o_orderkey", "o_orderpriority", "o_custkey")
      val per = base
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_cust_distinct"))
      base
        .join(per, Seq("o_orderpriority"))
        .select("o_orderkey", "o_orderpriority", "n_cust_distinct")
        .orderBy("o_orderkey")
    }),

    // Point-in-interval join WITHOUT an inequality-join plan: promo
    // windows [o_orderdate, +7d) explode to the ≤2 week-buckets they
    // overlap, shipment points hash to their single week-bucket, and
    // the contact is an EQUI-join on the bucket followed by the exact
    // containment filter. A raw interval predicate plans as
    // BroadcastNestedLoopJoin (every point × every window — dead at
    // 100 TB); here only intervals replicate (bounded by
    // span/bucket_width) and points never do, so the join scales like
    // any hash join. Bucket width tunes replication vs selectivity
    // exactly like any range-join binning.
    "join_interval_bucket" -> ((s, d) => {
      def wk(c: Column): Column =
        floor(datediff(c, lit("1970-01-01").cast("date")) / 7)
      val promo = orders(s, d)
        .filter(
          col("o_orderpriority") === "1-URGENT" &&
            col("o_orderkey") <= 300)
        .select(
          col("o_orderkey").as("promo_id"),
          col("o_orderdate").as("w_start"),
          (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("w_end"))
      val windows = promo
        .withColumn(
          "wkb", explode(sequence(wk(col("w_start")), wk(col("w_end")))))
      val points = lineitem(s, d)
        .select(col("l_shipdate"))
        .withColumn("wkb", wk(col("l_shipdate")))
      points
        .join(windows, Seq("wkb"))
        .filter(
          col("l_shipdate") >= col("w_start") &&
            col("l_shipdate") < col("w_end"))
        .groupBy("promo_id")
        .agg(count(lit(1)).as("n_shipments"))
        .orderBy("promo_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "join_broadcast" ->
      """SELECT c_mktsegment,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_shuffle" ->
      """SELECT o_orderpriority,
        |       count(*) AS n_items,
        |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
        |         AS extprice_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_multiway" ->
      """SELECT r_name,
        |       count(*) AS n_items,
        |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "join_left_outer" ->
      """SELECT n_orders, count(*) AS n_customers FROM (
        |  SELECT c_custkey, count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey) t
        |GROUP BY n_orders ORDER BY n_orders""".stripMargin,
    "join_semi" ->
      """SELECT count(*) AS n_customers_with_orders
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""
        .stripMargin,
    "join_anti" ->
      """SELECT count(*) AS n_customers_without_orders,
        |       coalesce(min(c_custkey), -1) AS min_custkey
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""
        .stripMargin,
    "join_range" ->
      """SELECT count(*) AS n_late_items
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey
        | AND l_shipdate > o_orderdate + INTERVAL 60 DAY""".stripMargin,
    "agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
        |         AS sum_qty_cents,
        |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
        |         AS sum_price_cents,
        |       CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100)
        |         AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
        |       min(CAST(round(l_extendedprice*100) AS BIGINT))
        |         AS min_price_cents,
        |       max(CAST(round(l_extendedprice*100) AS BIGINT))
        |         AS max_price_cents,
        |       count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_count_distinct" ->
      """SELECT o_orderpriority,
        |       count(DISTINCT o_custkey) AS n_custs,
        |       count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_avg" ->
      """SELECT c_mktsegment,
        |       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE)
        |         / count(*) AS avg_acctbal_cents,
        |       count(*) AS n_customers
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT)
        |         AS acctbal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST"""
        .stripMargin,
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |         l_linestatus ASC NULLS FIRST""".stripMargin,
    "window_rownum" ->
      """SELECT o_custkey, latest_orderkey, latest_date FROM (
        |  SELECT o_custkey, o_orderkey AS latest_orderkey,
        |         strftime(o_orderdate, '%Y-%m-%d') AS latest_date,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "window_rank" ->
      """SELECT p_brand, p_partkey, rnk, drnk FROM (
        |  SELECT p_brand, p_partkey,
        |         rank() OVER w AS rnk,
        |         dense_rank() OVER w AS drnk
        |  FROM part
        |  WINDOW w AS (PARTITION BY p_brand
        |               ORDER BY p_retailprice DESC, p_partkey ASC)) t
        |WHERE rnk <= 3 ORDER BY p_brand, rnk, p_partkey""".stripMargin,
    "window_lag" ->
      """SELECT c_mktsegment,
        |       CAST(sum(gap_days) AS BIGINT) AS sum_gap_days,
        |       count(*) AS n_gaps
        |FROM (
        |  SELECT o_custkey,
        |         date_diff('day', lag(o_orderdate) OVER (
        |           PARTITION BY o_custkey
        |           ORDER BY o_orderdate ASC, o_orderkey ASC),
        |           o_orderdate) AS gap_days
        |  FROM orders) t
        |JOIN customer ON o_custkey = c_custkey
        |WHERE gap_days IS NOT NULL
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
        |         PARTITION BY o_custkey
        |         ORDER BY o_orderdate ASC, o_orderkey ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS running_cents
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "fuzzy_match" -> ("WITH " + Fuzzy.blockedPairsSql(
      """t AS (
        |  SELECT DISTINCT p_name AS t FROM part WHERE p_partkey <= 300
        |)""".stripMargin,
      blockLen = 4,
      maxDist = 12)),
    "window_lead_first" ->
      """SELECT o_custkey, o_orderkey,
        |       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
        |         AS order_date,
        |       strftime(CAST(lead(o_orderdate, 1) OVER w AS DATE),
        |         '%Y-%m-%d') AS next_date,
        |       CAST(first_value(CAST(round(o_totalprice*100) AS BIGINT))
        |         OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate ASC, o_orderkey ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS first_cents
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "window_ntile" ->
      """SELECT quartile, count(*) AS n_customers,
        |       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT)
        |         AS acctbal_cents
        |FROM (
        |  SELECT c_acctbal, ntile(4) OVER (
        |    ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile
        |  FROM customer) t
        |GROUP BY quartile ORDER BY quartile""".stripMargin,
    "scd2_asof_lookup" ->
      """WITH l AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev_type,
        |         lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id)
        |           AS next_start
        |  FROM events
        |  WHERE user_id < 50 AND event_type <> 'purchase'
        |), dim0 AS (
        |  SELECT user_id AS d_user, event_type AS regime,
        |         tus AS valid_from_us,
        |         lead(tus) OVER (PARTITION BY user_id
        |           ORDER BY tus, event_id) AS nxt
        |  FROM l
        |  WHERE prev_type IS NULL OR prev_type <> event_type
        |), dim AS (
        |  SELECT d_user, regime, valid_from_us,
        |         coalesce(nxt, 9223372036854775807) AS valid_to_us
        |  FROM dim0
        |)
        |SELECT d.regime,
        |       CAST(count(*) AS BIGINT) AS n_purchases,
        |       CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_users,
        |       CAST(sum(CAST(round(p.value*100) AS BIGINT))
        |         AS BIGINT) AS cents
        |FROM (SELECT user_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS tus, value
        |      FROM events
        |      WHERE user_id < 50 AND event_type = 'purchase') p
        |JOIN dim d ON p.user_id = d.d_user
        |  AND p.tus >= d.valid_from_us AND p.tus < d.valid_to_us
        |GROUP BY 1 ORDER BY d.regime""".stripMargin,
    "scd2_intervals" ->
      """WITH l AS (
        |  SELECT user_id, event_id, event_type, ts,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev_type
        |  FROM events WHERE user_id < 50
        |), starts AS (
        |  SELECT user_id, event_id, event_type, ts
        |  FROM l
        |  WHERE prev_type IS NULL OR prev_type <> event_type
        |)
        |SELECT user_id, event_id, event_type,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |       COALESCE(strftime(lead(ts) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id), '%Y-%m-%d %H:%M:%S'),
        |         '9999-12-31 00:00:00') AS valid_to
        |FROM starts
        |ORDER BY user_id, valid_from, event_id""".stripMargin,
    "window_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
        |       count(*) OVER w AS n_30d,
        |       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER w
        |         AS BIGINT) AS cents_30d
        |FROM (
        |  SELECT *, date_diff('day', DATE '1990-01-01',
        |    CAST(o_orderdate AS DATE)) AS day_epoch
        |  FROM orders WHERE o_custkey < 30)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day_epoch
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, day_epoch, o_orderkey""".stripMargin,
    "agg_median" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.25)
        |         AS q1_cents,
        |       quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.5)
        |         AS median_cents,
        |       quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.75)
        |         AS q3_cents
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "window_ignore_nulls" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |         CASE WHEN o_orderstatus = 'F' THEN NULL
        |              ELSE o_orderstatus END AS sparse_status
        |  FROM orders WHERE o_custkey <= 30
        |)
        |SELECT o_custkey, o_orderkey,
        |       first_value(sparse_status IGNORE NULLS) OVER w
        |         AS first_nn,
        |       last_value(sparse_status IGNORE NULLS) OVER w
        |         AS last_nn,
        |       nth_value(sparse_status, 2 IGNORE NULLS) OVER w
        |         AS second_nn
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "agg_percentile_disc" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(quantile_disc(
        |         CAST(round(o_totalprice*100) AS BIGINT), 0.25)
        |         AS BIGINT) AS p25_cents,
        |       CAST(quantile_disc(
        |         CAST(round(o_totalprice*100) AS BIGINT), 0.5)
        |         AS BIGINT) AS p50_cents,
        |       CAST(quantile_disc(
        |         CAST(round(o_totalprice*100) AS BIGINT), 0.75)
        |         AS BIGINT) AS p75_cents
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_percentile_cont" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(round(4 * quantile_cont(
        |         CAST(round(o_totalprice*100) AS BIGINT), 0.25))
        |         AS BIGINT) AS p25_qcents,
        |       CAST(round(4 * quantile_cont(
        |         CAST(round(o_totalprice*100) AS BIGINT), 0.5))
        |         AS BIGINT) AS p50_qcents,
        |       CAST(round(4 * quantile_cont(
        |         CAST(round(o_totalprice*100) AS BIGINT), 0.75))
        |         AS BIGINT) AS p75_qcents
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_bool_bit" ->
      """SELECT event_type,
        |       CAST(sum(CASE WHEN value > 15.0 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_high,
        |       bool_and(value > 0.0) AS all_positive,
        |       bool_or(value > 19.0) AS any_extreme,
        |       CAST(bit_and(CAST(json_extract_string(props, '$.k')
        |         AS BIGINT) % 16) AS BIGINT) AS flags_and,
        |       CAST(bit_or(CAST(json_extract_string(props, '$.k')
        |         AS BIGINT) % 16) AS BIGINT) AS flags_or,
        |       CAST(bit_xor(CAST(json_extract_string(props, '$.k')
        |         AS BIGINT) % 16) AS BIGINT) AS flags_xor
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "weighted_median" ->
      """WITH pc AS (
        |  SELECT c.c_custkey, c.c_mktsegment,
        |         CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents,
        |         CAST(count(o.o_orderkey) AS BIGINT) AS w
        |  FROM customer c LEFT JOIN orders o
        |    ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2, 3
        |), cw AS (
        |  SELECT c_mktsegment, c_custkey, bal_cents,
        |         CAST(sum(w) OVER (PARTITION BY c_mktsegment
        |           ORDER BY bal_cents, c_custkey
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cumw,
        |         CAST(sum(w) OVER (PARTITION BY c_mktsegment)
        |           AS BIGINT) AS totw
        |  FROM pc
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY c_mktsegment
        |           ORDER BY bal_cents, c_custkey) AS rn
        |  FROM cw WHERE cumw * 2 >= totw
        |)
        |SELECT c_mktsegment, bal_cents AS wmedian_bal_cents,
        |       cumw AS cum_orders, totw AS total_orders
        |FROM r WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey,
        |       CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_cents
        |FROM orders
        |ORDER BY totalprice_cents DESC, o_orderkey ASC LIMIT 10"""
        .stripMargin,
    "setop_intersect" ->
      """SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
        |INTERSECT
        |SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY n_name""".stripMargin,
    "setop_except" ->
      """SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
        |EXCEPT
        |SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY n_name""".stripMargin,
    "setop_union" ->
      """SELECT count(*) AS n_rows_union_all,
        |       count(DISTINCT nationkey) AS n_distinct
        |FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey FROM supplier) t""".stripMargin,
    "distinct_segments" ->
      """SELECT DISTINCT c_mktsegment FROM customer
        |ORDER BY c_mktsegment""".stripMargin,
    "window_count_distinct" ->
      """SELECT o_orderkey, o_orderpriority,
        |       CAST(count(DISTINCT o_custkey) OVER
        |         (PARTITION BY o_orderpriority) AS BIGINT)
        |         AS n_cust_distinct
        |FROM orders WHERE o_orderkey <= 1000
        |ORDER BY o_orderkey""".stripMargin,
    "join_interval_bucket" ->
      """SELECT o_orderkey AS promo_id, count(*) AS n_shipments
        |FROM orders o JOIN lineitem l
        |  ON l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        |WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderkey <= 300
        |GROUP BY o_orderkey
        |ORDER BY o_orderkey""".stripMargin
  )
}
