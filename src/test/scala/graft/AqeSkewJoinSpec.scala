package graft

import org.apache.spark.sql.functions._

/** AQE's skew-join handling — the declarative counterpart to the
  * manual salting pattern (`join_salted`): at 100 TB you do not
  * hand-salt every hot key; you let adaptive execution detect the
  * oversized shuffle partition at runtime and split it into
  * advisory-sized chunks (replicating the matching dim rows). This
  * spec injects a hot key carrying ~80% of the fact rows, tunes the
  * detection thresholds down to fixture scale, and asserts the final
  * adaptive plan actually split the skewed partition (skew=true on
  * the join) AND that the result equals the non-adaptive join.
  */
class AqeSkewJoinSpec extends SparkTestBase {

  private val skewSf = "/root/testdata/sf0.01"

  private def skewedSides = {
    // ~80% of lineitem rows collapse onto key 0; the rest keep their
    // order key — one pathological reducer partition, like a null-key
    // or default-value hot spot in real data.
    // repartition(8) gives the shuffle 8 map tasks: AQE splits a
    // skewed reduce partition at map-output granularity, so a
    // single-mapper fixture read could never be split (a real
    // cluster always has many mappers).
    val fact = Tables
      .lineitem(spark, skewSf)
      .repartition(8)
      .withColumn(
        "k",
        when(pmod(col("l_orderkey"), lit(10)) < 8, lit(0L))
          .otherwise(col("l_orderkey")))
      .select(col("k"), round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val dim = Tables
      .orders(spark, skewSf)
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
      .union(
        spark.range(1).select(lit(0L).as("k"), lit("0-HOT").as("o_orderpriority")))
    (fact, dim)
  }

  private def aggregate(fact: org.apache.spark.sql.DataFrame,
                        dim: org.apache.spark.sql.DataFrame) =
    fact
      .join(dim, "k")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .orderBy("o_orderpriority")

  test("AQE splits the skewed partition without manual salting") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // The downstream aggregate re-shuffles anyway, but AQE's
      // conservative extra-shuffle check would still veto the split
      // at fixture scale — force it so the mechanism is exercised.
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val (fact, dim) = skewedSides
      val adaptive = aggregate(fact, dim)
      val adaptiveRows = adaptive.collect().toSeq

      // The final adaptive plan must mark the join as skew-handled.
      val plan = adaptive.queryExecution.executedPlan.toString
      assert(
        plan.contains("skew=true") || plan.contains("isSkewJoin=true"),
        s"expected AQE skew-join split in final plan:\n$plan")

      // Same answer as the non-adaptive plain shuffle join.
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plainRows = aggregate(fact, dim).collect().toSeq
      assert(adaptiveRows == plainRows)
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
