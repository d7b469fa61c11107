package graft

import org.apache.spark.sql.SparkSession

/** Mimics the driver's t1 smoke: a PLAIN session (none of Verify's
  * confs) calling SparkEntry.entry — catches any accidental dependence
  * on session configuration in the flagship path.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, truncate = false)
    println(s"[smoke] entry rows: $n")
    require(n > 0, "entry must return rows")
    spark.stop()
  }
}
