package graft

import org.apache.spark.sql.functions._
import graft.operators.Money

/** Invariant + differential pins for the market-basket pair family
  * (association rules, item-item CF), the weighted shortest-path
  * rounds, and the Benford governance audit. The DuckDB oracle pins
  * the values; these specs pin the properties a refactor could break
  * while still producing SOME oracle-matching shape — rule symmetry,
  * ranking contracts, the Bellman-Ford recurrence itself (against a
  * driver-side brute replay), and the exact-ppm bookkeeping.
  */
class BasketGraphSpec extends SparkTestBase {

  test("basket_rules: both directions priced, lift symmetric, exact ppm") {
    val rows = SparkEntry.queries("basket_rules")(spark, sfDir).collect()
    assert(rows.length <= 30 && rows.nonEmpty)
    rows.foreach { r =>
      val (nAb, nA, nB) = (r.getAs[Long]("n_ab"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(nAb >= 2 && nAb <= math.min(nA, nB),
        s"pair count $nAb outside [2, min($nA,$nB)]")
      assert(r.getAs[Long]("confidence_ppm") == 1000000L * nAb / nA)
      assert(r.getAs[Long]("support_ppm") <= r.getAs[Long]("confidence_ppm"),
        "support cannot exceed confidence (n_baskets >= n_a)")
    }
    // Lift is direction-free: wherever both orientations of a pair
    // survive the top-30 cut, their lift_ppm must be identical.
    val byPair = rows.groupBy(r => {
      val a = r.getAs[Long]("ante"); val c = r.getAs[Long]("cons")
      (math.min(a, c), math.max(a, c))
    })
    byPair.values.filter(_.length == 2).foreach { pair =>
      assert(pair(0).getAs[Long]("lift_ppm") ==
        pair(1).getAs[Long]("lift_ppm"),
        s"asymmetric lift for ${pair.toSeq}")
    }
  }

  test("item_cf_topk: 5 ranked neighbors per anchor, cosine in range") {
    val rows = SparkEntry.queries("item_cf_topk")(spark, sfDir).collect()
    val byItem = rows.groupBy(_.getAs[Long]("item"))
    assert(byItem.nonEmpty && byItem.size <= 20)
    byItem.foreach { case (item, rs) =>
      val ranked = rs.sortBy(_.getAs[Int]("rnk"))
      assert(ranked.map(_.getAs[Int]("rnk")).toSeq ==
        (1 to ranked.length), s"rank gap for item $item")
      val cs = ranked.map(_.getAs[Long]("cos2_ppm"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        s"cos2 not descending for item $item")
      cs.foreach(c => assert(c >= 0L && c <= 1000000L))
    }
  }

  test("sssp_weighted matches a driver-side Bellman-Ford replay") {
    val got = SparkEntry.queries("sssp_weighted")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist"))
      .toMap
    // Brute replay on collected edges (sf0.001 graph is tiny).
    val wp = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("p"))
      .agg(min(Money.cents(col("l_extendedprice"))).as("w"))
      .collect()
      .map(r => (r.getAs[Long]("c"), r.getAs[Long]("p"),
        r.getAs[Long]("w")))
    val edges = wp.flatMap { case (c, p, w) =>
      Seq((c, p, w), (p, c, w)) }
    var dist = Map(3L -> 0L)
    for (_ <- 1 to 3) {
      val relaxed = edges.flatMap { case (u, v, w) =>
        dist.get(u).map(du => v -> (du + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    assert(got == dist,
      s"distance maps differ: ${got.size} vs ${dist.size} nodes")
  }

  test("benford_audit: nine digits, counts total, expectations sum to 1e6") {
    val rows = SparkEntry.queries("benford_audit")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSeq.sorted == (1 to 9),
      "every leading digit 1-9 must appear for a money column")
    assert(rows.map(_.getAs[Long]("exp_ppm")).sum == 1000000L,
      "Benford expectation constants must sum to exactly 1e6")
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nOrders)
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_ppm") ==
        math.abs(r.getAs[Long]("obs_ppm") - r.getAs[Long]("exp_ppm")))
    }
  }

  test("kcore: monotone peel — every survivor saw degree >= k once") {
    val rows = SparkEntry.queries("kcore")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // Survivors of round 3 passed the k=5 gate at round 3's START;
    // the subsequent endpoint filter can only LOWER degrees, so the
    // reported core_deg may dip below k, but never below 1, and the
    // core must be a subset of the full graph's >= k-degree nodes.
    val fullDeg = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("p"))
      .distinct().collect()
      .flatMap(r => Seq(r.getAs[Long]("c") -> r.getAs[Long]("p"),
        r.getAs[Long]("p") -> r.getAs[Long]("c")))
      .groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    rows.foreach { r =>
      val node = r.getAs[Long]("node")
      val cd = r.getAs[Long]("core_deg")
      assert(cd >= 1L && cd <= fullDeg(node),
        s"node $node core degree $cd outside [1, ${fullDeg(node)}]")
    }
  }

  test("clustering_coeff + assortativity match a brute graph replay") {
    // The >=180-shared-customers threshold empties the co-purchase
    // graph below sf0.01, so this differential runs there.
    val dir = "/root/testdata/sf0.01"
    val edges = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("c"), r.getAs[Long]("sp")))
      .groupBy(_._1).values
      .flatMap { grp =>
        val sps = grp.map(_._2).distinct.sorted
        for (i <- sps.indices; j <- i + 1 until sps.length)
          yield (sps(i), sps(j))
      }
      // .iterator before collect: a Map.collect producing pairs
      // would REBUILD a Map and silently collapse edges sharing a
      // source node.
      .groupBy(identity).iterator.collect {
        case (e, occ) if occ.size >= 180 => e
      }.toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val rows = SparkEntry.queries("clustering_coeff")(spark, dir)
      .collect()
    val expected = adj.filter(_._2.size >= 2).map { case (n, nb) =>
      val t = nb.toSeq.combinations(2)
        .count { case Seq(a, b) => adj(a).contains(b) }
      n -> (nb.size.toLong, t.toLong,
        1000000L * 2 * t / (nb.size.toLong * (nb.size - 1)))
    }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (deg, tri, coeff) = expected(r.getAs[Long]("node"))
      assert(r.getAs[Long]("deg") == deg)
      assert(r.getAs[Long]("n_tri") == tri)
      assert(r.getAs[Long]("coeff_ppm") == coeff)
    }
    // Assortativity: replay the sufficient statistics on both edge
    // directions and compare exactly.
    val degM = adj.map { case (n, nb) => n -> nb.size.toLong }
    val dirs = edges.toSeq.flatMap { case (u, v) =>
      Seq((degM(u), degM(v)), (degM(v), degM(u))) }
    val a = SparkEntry.queries("degree_assortativity")(spark, dir)
      .collect().head
    assert(a.getAs[Long]("n") == dirs.length)
    assert(a.getAs[Long]("sxy") == dirs.map(p => p._1 * p._2).sum)
    val n = dirs.length.toLong
    val sx = dirs.map(_._1).sum
    assert(a.getAs[Long]("num") ==
      n * dirs.map(p => p._1 * p._2).sum - sx * sx)
    assert(a.getAs[Long]("den") ==
      n * dirs.map(p => p._1 * p._1).sum - sx * sx)
  }

  test("pair-family plans stay cartesian-free") {
    Seq("basket_rules", "item_cf_topk", "sssp_weighted", "kcore").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$q plans a cartesian:\n$plan")
    }
  }
}
