package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** The remainder of the TPC-H suite (q3/q5/q10/q18 live in
  * AnalyticsQueries), adapted to the driver's synthetic star schema —
  * the relational-completeness statement: every distinctive TPC-H plan
  * shape (correlated scalar subqueries, EXISTS/NOT-EXISTS semi/anti
  * self-joins, disjunctive join predicates, left-outer histograms,
  * view-over-view max selection) runs on this engine and hash-pins
  * against DuckDB.
  *
  * Schema adaptations (the synthetic tables lack some TPC-H columns —
  * each stand-in keeps the QUERY SHAPE, which is what exercises the
  * engine):
  *   - no `partsupp` table → derived from lineitem:
  *     `ps(partkey, suppkey, cost, qty)` where cost is the minimum
  *     observed unit price in integer cents (cents DIV quantity) and
  *     qty the total shipped volume. One groupBy over lineitem, reused
  *     by q2/q9/q11/q16/q20.
  *   - no `l_commitdate`/`l_receiptdate` → "late" :=
  *     `l_shipdate > o_orderdate + INTERVAL N DAYS` (q4, q21), the
  *     same non-equi semi-join shape.
  *   - no `l_shipmode` → `l_returnflag` carries the q12 grouping; the
  *     conditional priority-split aggregate is unchanged.
  *   - no `p_container` → `p_size` range predicates (q17, q19).
  *   - no `c_phone` → `c_nationkey` is the q22 country code.
  *   - no comment columns → status/priority predicates stand in for
  *     the LIKE-on-comment filters (q13, q16).
  *
  * Determinism: all money is per-row-rounded integer cents
  * (Money.cents ≡ `CAST(round(x*100) AS BIGINT)`), ratios are exact
  * ppm via integer division (`DIV` / DuckDB `//`), quantities are
  * integral doubles cast to long, averages are single IEEE divisions
  * of exact integers (the agg_avg convention), and every query ends in
  * a total order with explicit tiebreaks.
  *
  * Scale design: dimension sides (`nation`, `region`, filtered `part`
  * subsets, the ≤K scalar aggregates) broadcast; fact-fact joins
  * shuffle on their keys (co-partitionable / bucketable at 100 TB, see
  * BucketedJoinSpec); the derived-ps groupBy is ONE shuffle on
  * (partkey, suppkey) feeding every consumer; correlated subqueries
  * become grouped aggregates joined back on the correlation key —
  * never per-row re-execution; `DIV`-threshold HAVING filters compare
  * longs against a one-row broadcast aggregate.
  */
object TpchQueries {

  private def cents(c: Column): Column = Money.cents(c)

  private def revCents: Column =
    cents(col("l_extendedprice") * (lit(1) - col("l_discount")))

  private val revCentsSql =
    "CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)"

  /** Derived part-supplier relation (the missing `partsupp`):
    * per (partkey, suppkey) the minimum observed unit price in cents
    * (integer division — exact cross-engine) and total shipped
    * quantity. One shuffle on the composite key, materialized ONCE per
    * (session, dir) via `Checkpoints.pin` and memoized — q2/q9/q11/
    * q16/q20 all read the pinned table instead of re-aggregating
    * lineitem (the at-scale shape: partsupp is a maintained table, not
    * a per-query derivation).
    */
  private val psCache = new SessionMemo[DataFrame]

  private def ps(s: SparkSession, d: String): DataFrame =
    psCache.getOrCompute(s, d) {
      graft.Checkpoints.pin(
        lineitem(s, d)
          .select(
            col("l_partkey").as("ps_partkey"),
            col("l_suppkey").as("ps_suppkey"),
            expr(
              "CAST(round(l_extendedprice*100) AS BIGINT) DIV CAST(l_quantity AS BIGINT)")
              .as("unit_cents"),
            col("l_quantity").cast("long").as("qty"))
          .groupBy("ps_partkey", "ps_suppkey")
          .agg(
            min(col("unit_cents")).as("ps_supplycost_cents"),
            sum(col("qty")).as("ps_qty")))
    }

  private val psSql =
    """ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         min(CAST(round(l_extendedprice*100) AS BIGINT)
      |             // CAST(l_quantity AS BIGINT)) AS ps_supplycost_cents,
      |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_qty
      |  FROM lineitem GROUP BY 1, 2
      |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1: the full pricing summary (agg_pricing's superset): charge
    // includes the tax term, averages via single divisions of exact
    // sums. One scan, one grouped aggregate, map-side combine on longs.
    "tpch_q1" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_price_cents"),
          sum(revCents).as("sum_disc_price_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")))).as("sum_charge_cents"),
          (sum(col("l_quantity").cast("long")).cast("double") /
            count(lit(1))).as("avg_qty"),
          (sum(cents(col("l_extendedprice"))).cast("double") /
            count(lit(1))).as("avg_price_cents"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Q2: min-cost supplier — the correlated scalar subquery. The
    // per-part regional minimum cost is a grouped aggregate joined
    // back on (partkey, cost); EUROPE's nation set broadcasts.
    "tpch_q2" -> ((s, d) => {
      val euNations = broadcast(
        nation(s, d)
          .join(
            region(s, d).filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name"))
      val euPs = ps(s, d)
        .join(
          supplier(s, d).select(
            col("s_suppkey"), col("s_name"),
            cents(col("s_acctbal")).as("acctbal_cents"),
            col("s_nationkey")),
          col("ps_suppkey") === col("s_suppkey"))
        .join(euNations, col("s_nationkey") === col("n_nationkey"))
      val minCost = euPs
        .groupBy(col("ps_partkey").as("mc_partkey"))
        .agg(min(col("ps_supplycost_cents")).as("min_cost_cents"))
      euPs
        .join(
          broadcast(part(s, d).filter(col("p_type") === "LARGE")
            .select("p_partkey")),
          col("ps_partkey") === col("p_partkey"))
        .join(
          minCost,
          col("ps_partkey") === col("mc_partkey") &&
            col("ps_supplycost_cents") === col("min_cost_cents"))
        .select(
          col("acctbal_cents"), col("s_name"), col("n_name"),
          col("p_partkey"), col("ps_supplycost_cents"))
        .orderBy(col("acctbal_cents").desc, col("n_name").asc,
          col("s_name").asc, col("p_partkey").asc)
        .limit(100)
    }),

    // Q4: order-priority checking — EXISTS as a non-equi LEFT-SEMI
    // (orderkey equality + the lateness inequality against the outer
    // row's own orderdate), then a grouped count.
    "tpch_q4" -> ((s, d) => {
      val ord = orders(s, d)
        .filter(
          col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      ord
        .join(
          lineitem(s, d).select("l_orderkey", "l_shipdate"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") >
              col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // Q6: forecasting revenue change — pure scan-side predicates
    // (pushed to parquet), one global sum of per-row-rounded cents.
    // The discount band compares exact integer percent, not floats.
    "tpch_q6" -> ((s, d) =>
      lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            round(col("l_discount") * 100).cast("int").between(5, 7) &&
            col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice") * col("l_discount")))
          .as("revenue_cents"))),

    // Q7: volume shipping between two nations, both directions — the
    // double-dimension join where the pair predicate spans both sides.
    // Both nation maps broadcast; facts shuffle on their join keys.
    "tpch_q7" -> ((s, d) => {
      val nat = nation(s, d).select("n_nationkey", "n_name")
      val supp = supplier(s, d).select("s_suppkey", "s_nationkey")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = customer(s, d).select("c_custkey", "c_nationkey")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"), revCents.as("rev"))
        .join(orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .filter(
          (col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" &&
              col("cust_nation") === "NATION_1"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum(col("rev")).as("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Q8: national market share — the share of one supplier nation in
    // a region's order volume for one part type, per year, as exact
    // ppm (integer division of cent sums; no float accumulation).
    "tpch_q8" -> ((s, d) => {
      val amNations = broadcast(
        nation(s, d)
          .join(
            region(s, d).filter(col("r_name") === "AMERICA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("cn_nationkey")))
      val suppNat = supplier(s, d).select("s_suppkey", "s_nationkey")
        .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          revCents.as("rev"))
        .join(
          broadcast(part(s, d).filter(col("p_type") === "PROMO")
            .select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .join(
          orders(s, d)
            .filter(
              col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
            .select(col("o_orderkey"), col("o_custkey"),
              year(col("o_orderdate")).as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(amNations, col("c_nationkey") === col("cn_nationkey"))
        .join(suppNat, col("l_suppkey") === col("s_suppkey"))
        .groupBy("o_year")
        .agg(
          sum(when(col("supp_nation") === "NATION_3", col("rev"))
            .otherwise(lit(0L))).as("nation_rev"),
          sum(col("rev")).as("total_rev"))
        .select(col("o_year"),
          expr("1000000 * nation_rev DIV total_rev").as("mkt_share_ppm"))
        .orderBy("o_year")
    }),

    // Q9: product-type profit — revenue minus derived supply cost per
    // line, grouped by supplier nation and order year. The ps cost
    // rides the (partkey, suppkey) key; the part-name filter prunes
    // before any fact join.
    "tpch_q9" -> ((s, d) => {
      val gearParts = broadcast(
        part(s, d).filter(col("p_name").like("%gear%"))
          .select("p_partkey"))
      val suppNat = supplier(s, d).select("s_suppkey", "s_nationkey")
        .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("long").as("qty"), revCents.as("rev"))
        .join(gearParts, col("l_partkey") === col("p_partkey"))
        .join(ps(s, d),
          col("l_partkey") === col("ps_partkey") &&
            col("l_suppkey") === col("ps_suppkey"))
        .join(orders(s, d).select(col("o_orderkey"),
          year(col("o_orderdate")).as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(suppNat, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg(sum(col("rev") - col("ps_supplycost_cents") * col("qty"))
          .as("profit_cents"))
        .orderBy(col("nation").asc, col("o_year").desc)
    }),

    // Q11: important stock — per-part supply value restricted to one
    // region's suppliers, kept where the value exceeds a fixed
    // fraction of the regional total (HAVING vs a one-row broadcast
    // scalar, compared in exact longs).
    "tpch_q11" -> ((s, d) => {
      val euNations = broadcast(
        nation(s, d)
          .join(
            region(s, d).filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey"))
      val euValue = ps(s, d)
        .join(supplier(s, d).select("s_suppkey", "s_nationkey"),
          col("ps_suppkey") === col("s_suppkey"))
        .join(euNations, col("s_nationkey") === col("n_nationkey"))
        .select(col("ps_partkey"),
          (col("ps_supplycost_cents") * col("ps_qty")).as("value_cents"))
      val perPart = euValue.groupBy("ps_partkey")
        .agg(sum(col("value_cents")).as("value_cents"))
      val total = euValue.agg(sum(col("value_cents")).as("total_cents"))
      perPart
        .crossJoin(broadcast(total))
        .filter(col("value_cents") > expr("total_cents DIV 1000"))
        .select(col("ps_partkey"), col("value_cents"))
        .orderBy(col("value_cents").desc, col("ps_partkey").asc)
    }),

    // Q12: shipmode priority split — the conditional aggregate after a
    // fact-fact join (returnflag stands in for the absent shipmode).
    "tpch_q12" -> ((s, d) =>
      lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_returnflag")
        .join(orders(s, d).select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")),

    // Q13: customer order-count distribution — LEFT OUTER with the
    // filter INSIDE the join condition (so order-less customers
    // survive), then the histogram-of-counts double aggregate.
    "tpch_q13" -> ((s, d) =>
      customer(s, d).select("c_custkey")
        .join(
          orders(s, d)
            .select("o_orderkey", "o_custkey", "o_orderstatus"),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderstatus") =!= "P",
          "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)),

    // Q14: promo revenue share in one month, as exact ppm.
    "tpch_q14" -> ((s, d) =>
      lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .select(col("l_partkey"), revCents.as("rev"))
        .join(broadcast(part(s, d).select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev")).otherwise(0L))
            .as("promo_rev"),
          sum(col("rev")).as("total_rev"))
        .select(expr("1000000 * promo_rev DIV total_rev")
          .as("promo_share_ppm"))),

    // Q15: top supplier — the revenue view consumed twice (per-supplier
    // aggregate, then its own max as a one-row broadcast), equality on
    // the max keeps ties like the spec.
    "tpch_q15" -> ((s, d) => {
      val rev = lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(revCents).as("total_revenue_cents"))
      val maxRev = rev.agg(max(col("total_revenue_cents")).as("max_rev"))
      rev
        .crossJoin(broadcast(maxRev))
        .filter(col("total_revenue_cents") === col("max_rev"))
        .join(supplier(s, d).select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_cents")
        .orderBy("s_suppkey")
    }),

    // Q16: supplier count per part descriptor — the NOT-IN as an
    // anti-join (suppliers in deficit stand in for the complaint
    // filter), distinct suppliers counted per (brand, type, size).
    "tpch_q16" -> ((s, d) =>
      ps(s, d).select("ps_partkey", "ps_suppkey")
        .join(
          broadcast(part(s, d)
            .filter(
              col("p_brand") =!= "Brand#5" &&
                col("p_type") =!= "PROMO" &&
                col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
            .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("ps_partkey") === col("p_partkey"))
        .join(
          supplier(s, d).filter(col("s_acctbal") < 0)
            .select("s_suppkey"),
          col("ps_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
          col("p_type").asc, col("p_size").asc)),

    // Q17: small-quantity-order revenue — the correlated 0.2*avg(qty)
    // per part becomes a grouped (sum, count) joined back; the fifth
    // comparison is exact long arithmetic (5*qty*cnt < sum), never a
    // float threshold. Output is cents DIV 7 ("avg yearly").
    "tpch_q17" -> ((s, d) => {
      val liQ = lineitem(s, d).select(
        col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        cents(col("l_extendedprice")).as("price_cents"))
      val smallParts = broadcast(
        part(s, d)
          .filter(col("p_brand") === "Brand#3" && col("p_size") <= 5)
          .select("p_partkey"))
      val perPart = liQ
        .join(smallParts, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey").as("pp_partkey"))
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("cnt"))
      liQ
        .join(smallParts, col("l_partkey") === col("p_partkey"))
        .join(perPart, col("l_partkey") === col("pp_partkey"))
        .filter(col("qty") * 5 * col("cnt") < col("sum_qty"))
        .agg(expr("sum(price_cents) DIV 7").as("avg_yearly_cents"))
    }),

    // Q19: disjunctive predicate join — three OR'd conjunct groups
    // spanning both sides, evaluated inside one part⋈lineitem join
    // (size ranges stand in for the absent container).
    "tpch_q19" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"), revCents.as("rev"))
        .join(
          broadcast(part(s, d)
            .select("p_partkey", "p_brand", "p_size")),
          col("l_partkey") === col("p_partkey") && (
            (col("p_brand") === "Brand#1" &&
              col("p_size").between(1, 10) &&
              col("l_quantity").between(1, 11)) ||
              (col("p_brand") === "Brand#2" &&
                col("p_size").between(11, 20) &&
                col("l_quantity").between(10, 20)) ||
              (col("p_brand") === "Brand#3" &&
                col("p_size").between(21, 30) &&
                col("l_quantity").between(20, 30))))
        .agg(sum(col("rev")).as("revenue_cents"))),

    // Q20: excess-supply suppliers — the nested double-semi: parts by
    // name prefix → heavy 1997 supply pairs (HAVING on shipped volume)
    // → suppliers in one region, name-ordered.
    "tpch_q20" -> ((s, d) => {
      val smallParts = broadcast(
        part(s, d).filter(col("p_name").like("small%"))
          .select("p_partkey"))
      val heavyPairs = lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(smallParts, col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity").cast("long")).as("shipped_qty"))
        .filter(col("shipped_qty") > 50)
        .select("l_suppkey")
      val euNations = broadcast(
        nation(s, d)
          .join(
            region(s, d).filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey"))
      supplier(s, d).select("s_suppkey", "s_name", "s_nationkey")
        .join(heavyPairs, col("s_suppkey") === col("l_suppkey"),
          "left_semi")
        .join(euNations, col("s_nationkey") === col("n_nationkey"))
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    }),

    // Q21: suppliers who kept orders waiting — EXISTS (another supplier
    // on the order) as a non-equi LEFT-SEMI and NOT EXISTS (another
    // LATE supplier) as a non-equi LEFT-ANTI against the once-computed
    // late set; multiplicity follows the spec (one count per late
    // line, not per order).
    "tpch_q21" -> ((s, d) => {
      val ordF = orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      // Pinned: the late set feeds both the EXISTS base and the
      // NOT-EXISTS side — one lineitem⋈orders pass, not two.
      val late = graft.Checkpoints.pin(
        lineitem(s, d)
          .select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(ordF,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") >
                col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .select("l_orderkey", "l_suppkey"))
      val lateOthers = late
        .select(col("l_orderkey").as("lo_orderkey"),
          col("l_suppkey").as("lo_suppkey"))
        .distinct()
      val others = lineitem(s, d)
        .select(col("l_orderkey").as("ol_orderkey"),
          col("l_suppkey").as("ol_suppkey"))
      late
        .join(others,
          col("l_orderkey") === col("ol_orderkey") &&
            col("l_suppkey") =!= col("ol_suppkey"),
          "left_semi")
        .join(lateOthers,
          col("l_orderkey") === col("lo_orderkey") &&
            col("l_suppkey") =!= col("lo_suppkey"),
          "left_anti")
        .join(supplier(s, d).select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(100)
    }),

    // Q22: dormant high-balance customers — the positive-balance
    // average as a one-row broadcast compared in exact longs
    // (cents*count > sum), NOT EXISTS recent orders as an anti-join
    // (the spec's "no orders in 7 years", here "none since 1999" —
    // every synthetic customer has SOME order), nationkey standing in
    // for the phone country code.
    "tpch_q22" -> ((s, d) => {
      val cust = customer(s, d).select(
        col("c_custkey"), col("c_nationkey").as("cntrycode"),
        cents(col("c_acctbal")).as("acctbal_cents"))
      val posAvg = cust.filter(col("acctbal_cents") > 0)
        .agg(sum(col("acctbal_cents")).as("pos_sum"),
          count(lit(1)).as("pos_cnt"))
      cust
        .crossJoin(broadcast(posAvg))
        .filter(col("acctbal_cents") * col("pos_cnt") > col("pos_sum"))
        .join(
          orders(s, d)
            .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"),
          sum(col("acctbal_cents")).as("totacctbal_cents"))
        .orderBy("cntrycode")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
         |         AS BIGINT) AS sum_base_price_cents,
         |       CAST(sum($revCentsSql) AS BIGINT) AS sum_disc_price_cents,
         |       CAST(sum(CAST(round(
         |           l_extendedprice*(1-l_discount)*(1+l_tax)*100)
         |         AS BIGINT)) AS BIGINT) AS sum_charge_cents,
         |       CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
         |         / count(*) AS avg_qty,
         |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
         |         AS DOUBLE) / count(*) AS avg_price_cents,
         |       count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tpch_q2" ->
      s"""WITH $psSql,
         |eu_ps AS (
         |  SELECT ps.*, s_name,
         |         CAST(round(s_acctbal*100) AS BIGINT) AS acctbal_cents,
         |         n_name
         |  FROM ps
         |  JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'EUROPE'
         |)
         |SELECT acctbal_cents, s_name, n_name, p_partkey,
         |       ps_supplycost_cents
         |FROM eu_ps
         |JOIN part ON ps_partkey = p_partkey
         |WHERE p_type = 'LARGE'
         |  AND ps_supplycost_cents = (
         |    SELECT min(e2.ps_supplycost_cents) FROM eu_ps e2
         |    WHERE e2.ps_partkey = p_partkey)
         |ORDER BY acctbal_cents DESC, n_name ASC, s_name ASC,
         |         p_partkey ASC
         |LIMIT 100""".stripMargin,
    "tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "tpch_q6" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice*l_discount*100)
        |         AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND CAST(round(l_discount*100) AS INTEGER) BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,
    "tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |       CAST(year(l_shipdate) AS INTEGER) AS l_year,
         |       CAST(sum($revCentsSql) AS BIGINT) AS revenue_cents
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "tpch_q8" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |       CAST(1000000 * sum(CASE WHEN n1.n_name = 'NATION_3'
         |             THEN $revCentsSql ELSE 0 END) AS BIGINT)
         |         // CAST(sum($revCentsSql) AS BIGINT) AS mkt_share_ppm
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |JOIN region ON n2.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |WHERE p_type = 'PROMO'
         |  AND r_name = 'AMERICA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY o_year
         |ORDER BY o_year""".stripMargin,
    "tpch_q9" ->
      s"""WITH $psSql
         |SELECT n_name AS nation,
         |       CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |       CAST(sum($revCentsSql
         |           - ps_supplycost_cents * CAST(l_quantity AS BIGINT))
         |         AS BIGINT) AS profit_cents
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%gear%'
         |GROUP BY n_name, o_year
         |ORDER BY nation ASC, o_year DESC""".stripMargin,
    "tpch_q11" ->
      s"""WITH $psSql,
         |eu_value AS (
         |  SELECT ps_partkey,
         |         ps_supplycost_cents * ps_qty AS value_cents
         |  FROM ps
         |  JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'EUROPE'
         |)
         |SELECT ps_partkey,
         |       CAST(sum(value_cents) AS BIGINT) AS value_cents
         |FROM eu_value
         |GROUP BY ps_partkey
         |HAVING CAST(sum(value_cents) AS BIGINT) >
         |  (SELECT CAST(sum(value_cents) AS BIGINT) // 1000 FROM eu_value)
         |ORDER BY value_cents DESC, ps_partkey ASC""".stripMargin,
    "tpch_q12" ->
      """SELECT l_returnflag,
        |       CAST(sum(CASE WHEN o_orderpriority IN
        |           ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
        |         AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority IN
        |           ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
        |         AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderstatus <> 'P'
        |  GROUP BY c_custkey
        |) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "tpch_q14" ->
      s"""SELECT CAST(1000000 * sum(CASE WHEN p_type = 'PROMO'
         |           THEN $revCentsSql ELSE 0 END) AS BIGINT)
         |         // CAST(sum($revCentsSql) AS BIGINT)
         |         AS promo_share_ppm
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
         |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,
    "tpch_q15" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey,
         |         CAST(sum($revCentsSql) AS BIGINT)
         |           AS total_revenue_cents
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate < TIMESTAMP '1997-04-01'
         |  GROUP BY l_suppkey
         |)
         |SELECT s_suppkey, s_name, total_revenue_cents
         |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue_cents =
         |  (SELECT max(total_revenue_cents) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin,
    "tpch_q16" ->
      s"""WITH $psSql
         |SELECT p_brand, p_type, p_size,
         |       count(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM ps
         |JOIN part ON ps_partkey = p_partkey
         |WHERE p_brand <> 'Brand#5'
         |  AND p_type <> 'PROMO'
         |  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
         |  AND ps_suppkey NOT IN
         |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC,
         |         p_size ASC""".stripMargin,
    "tpch_q17" ->
      """WITH small AS (
        |  SELECT p_partkey FROM part
        |  WHERE p_brand = 'Brand#3' AND p_size <= 5
        |), per_part AS (
        |  SELECT l_partkey AS pp_partkey,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |           AS sum_qty,
        |         count(*) AS cnt
        |  FROM lineitem JOIN small ON l_partkey = p_partkey
        |  GROUP BY 1
        |)
        |SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
        |         AS BIGINT) // 7 AS avg_yearly_cents
        |FROM lineitem
        |JOIN small ON l_partkey = p_partkey
        |JOIN per_part ON l_partkey = pp_partkey
        |WHERE CAST(l_quantity AS BIGINT) * 5 * cnt < sum_qty"""
        .stripMargin,
    "tpch_q19" ->
      s"""SELECT CAST(sum($revCentsSql) AS BIGINT) AS revenue_cents
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 20
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 21 AND 30
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "tpch_q20" ->
      """SELECT s_name, s_suppkey
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN
        |      (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |      AND l_shipdate >= TIMESTAMP '1997-01-01'
        |      AND l_shipdate < TIMESTAMP '1998-01-01'
        |    GROUP BY l_partkey, l_suppkey
        |    HAVING CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) > 50)
        |ORDER BY s_name""".stripMargin,
    "tpch_q21" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |)
        |SELECT s_name, count(*) AS numwait
        |FROM late l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 100""".stripMargin,
    "tpch_q22" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey AS cntrycode,
        |         CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents
        |  FROM customer
        |), pos AS (
        |  SELECT CAST(sum(acctbal_cents) AS BIGINT) AS pos_sum,
        |         count(*) AS pos_cnt
        |  FROM cust WHERE acctbal_cents > 0
        |)
        |SELECT cntrycode, count(*) AS numcust,
        |       CAST(sum(acctbal_cents) AS BIGINT) AS totacctbal_cents
        |FROM cust, pos
        |WHERE acctbal_cents * pos_cnt > pos_sum
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin
  )
}
