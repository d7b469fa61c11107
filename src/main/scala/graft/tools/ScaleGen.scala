package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the sf1.0 probe (round-14 verdict item 7):
  * the first empirical point on the 100x scaling curve the plan audits
  * argue from. Replicates the driver's sf0.1 tables K times (default
  * K=10 ~ sf1.0) into an output dir with the SAME schemas, such that
  * every replica is a self-contained isomorphic copy:
  *
  *  - TPC-H-ish keys shift by replica * (max_key + 1), consistently
  *    across fact/dim tables, so every join finds exactly its own
  *    replica's matches — selectivities and join fan-outs are
  *    preserved, cardinalities scale by K.
  *  - `documents.text` gets a replica-disjoint vocabulary for i > 0
  *    (every whitespace token suffixed with a replica marker): shingle
  *    and token sets NEVER collide across replicas, so near-dup pair
  *    counts, LSH bucket sizes, and token statistics scale by exactly
  *    K instead of degenerating into one giant everything-matches
  *    cluster (which a naive text copy would produce — K^2 pair
  *    blowup would measure an artifact, not scaling).
  *  - `embeddings.embedding` is rotated by i positions: rotation
  *    preserves norms and intra-replica dot products exactly (both
  *    vectors rotate together), so ANN structure is isomorphic per
  *    replica while cross-replica similarities are scrambled.
  *  - `events` shifts event/user ids and keeps the time axis, i.e.
  *    the same window span at K times the density — the realistic
  *    shape for a busier stream.
  *
  * Env: SPARK_GRAFT_SRC_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_OUT_DIR (default /root/repo/tmp_scale/sf1.0),
  *      SPARK_GRAFT_SCALE   (default 10).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SRC_DIR", "/root/testdata/sf0.1")
    val out =
      sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", "/root/repo/tmp_scale/sf1.0")
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val reps = spark.range(k).select($"id".cast("int").as("rep"))

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    /** replica * (max+1) offset for a key column, computed once. */
    def span(df: DataFrame, col: String): Long =
      df.agg(max(col)).head.getLong(0) + 1L

    def write(df: DataFrame, t: String, parts: Int): Unit = {
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
      println(s"[scalegen] $t x$k -> $out/$t.parquet ($parts files)")
    }

    // ---- dims copied verbatim (region/nation are lookup enums) ----
    Seq("region", "nation").foreach(t => write(read(t), t, 1))

    // ---- key-shifted TPC-H family ----
    val customer = read("customer")
    val supplier = read("supplier")
    val part = read("part")
    val orders = read("orders")
    val lineitem = read("lineitem")
    val ck = span(customer, "c_custkey")
    val sk = span(supplier, "s_suppkey")
    val pk = span(part, "p_partkey")
    val ok = span(orders, "o_orderkey")

    write(customer.crossJoin(broadcast(reps))
      .withColumn("c_custkey", $"c_custkey" + $"rep" * ck)
      .drop("rep"), "customer", 4)
    write(supplier.crossJoin(broadcast(reps))
      .withColumn("s_suppkey", $"s_suppkey" + $"rep" * sk)
      .drop("rep"), "supplier", 1)
    write(part.crossJoin(broadcast(reps))
      .withColumn("p_partkey", $"p_partkey" + $"rep" * pk)
      .drop("rep"), "part", 4)
    write(orders.crossJoin(broadcast(reps))
      .withColumn("o_orderkey", $"o_orderkey" + $"rep" * ok)
      .withColumn("o_custkey", $"o_custkey" + $"rep" * ck)
      .drop("rep"), "orders", 8)
    write(lineitem.crossJoin(broadcast(reps))
      .withColumn("l_orderkey", $"l_orderkey" + $"rep" * ok)
      .withColumn("l_partkey", $"l_partkey" + $"rep" * pk)
      .withColumn("l_suppkey", $"l_suppkey" + $"rep" * sk)
      .drop("rep"), "lineitem", 32)

    // ---- events: same time axis, K times the density ----
    val events = read("events")
    val ek = span(events, "event_id")
    val uk = span(events, "user_id")
    write(events.crossJoin(broadcast(reps))
      .withColumn("event_id", $"event_id" + $"rep" * ek)
      .withColumn("user_id", $"user_id" + $"rep" * uk)
      .drop("rep"), "events", 8)

    // ---- documents: replica-disjoint vocabulary ----
    val docs = read("documents")
    val dk = span(docs.withColumn("doc_id", $"doc_id".cast("long")), "doc_id")
    val scaledText = when($"rep" === 0, $"text").otherwise(
      array_join(
        transform(split($"text", " "),
          w => concat(w, lit("·"), $"rep".cast("string"))),
        " "))
    write(docs.crossJoin(broadcast(reps))
      .withColumn("doc_id", ($"doc_id".cast("long") + $"rep" * dk)
        .cast(docs.schema("doc_id").dataType))
      .withColumn("text", scaledText)
      .withColumn("n_chars", length($"text")
        .cast(docs.schema("n_chars").dataType))
      .drop("rep"), "documents", 8)

    // ---- embeddings: rotation-isomorphic replicas ----
    val emb = read("embeddings")
    val vk = span(emb.withColumn("vec_id", $"vec_id".cast("long")), "vec_id")
    val dim = emb.select(size($"embedding")).head.getInt(0)
    val rot = $"rep" % dim
    val rotated = when($"rep" === 0, $"embedding").otherwise(
      concat(
        slice($"embedding", rot + 1, lit(dim) - rot),
        slice($"embedding", lit(1), rot)))
    write(emb.crossJoin(broadcast(reps))
      .withColumn("vec_id", ($"vec_id".cast("long") + $"rep" * vk)
        .cast(emb.schema("vec_id").dataType))
      .withColumn("embedding", rotated)
      .drop("rep"), "embeddings", 8)

    spark.stop()
  }
}
