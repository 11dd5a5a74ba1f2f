package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan inspector: prints the formatted plan + timed count for one
  * SparkEntry query. Not part of the driver contract.
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(s"rows=$n time=${(System.nanoTime() - t0) / 1e9}")
    val t1 = System.nanoTime()
    val n2 = SparkEntry.queries(name)(spark, sfDir).count()
    println(s"rows=$n2 warm_time=${(System.nanoTime() - t1) / 1e9}")
    spark.stop()
  }
}
