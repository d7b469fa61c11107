package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the formatted physical plan and wall time
  * of one or more registered queries. Usage:
  *
  *   runMain graft.Explain <sfDir> [queryName ...]
  *
  * No names → all queries. This is the SURVEY.md §4 feedback loop:
  * check PushedFilters / ReadSchema / WholeStageCodegen spans / join
  * strategies before trusting a bench number.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"== $name: NOT REGISTERED")
        case Some(fn) =>
          println(s"\n==== $name ====")
          val df = fn(spark, sfDir)
          df.explain("formatted")
          val t0 = System.nanoTime()
          val n = df.count()
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"== $name: $n rows in $dt%.3f s")
      }
    }
    spark.stop()
  }
}
