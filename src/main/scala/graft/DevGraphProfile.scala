package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: phase timing for graph_pagerank (not part of the contract). */
object DevGraphProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GP_AQE","true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[gp] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.functions._
    val pairs = queries.Tables.orders(spark, sfDir)
      .join(queries.Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("cu"), (col("l_suppkey") * 2 + 1).as("su"))
      .distinct()
    val edges = pairs.select(col("cu").as("src"), col("su").as("dst"))
      .unionAll(pairs.select(col("su").as("src"), col("cu").as("dst")))
      .persist()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val n = time("deg.count")(deg.count())
    val withDeg = edges.join(deg, "src").persist()
    time("withDeg materialize")(withDeg.count())
    var ranks = deg.select(col("src").as("node"), lit(1000000000000L / n).as("pr"))
    for (i <- 1 to 10) {
      ranks = time(s"iter $i") {
        withDeg.join(broadcast(ranks), col("src") === col("node"))
          .select(col("dst"), expr("pr DIV deg").as("contrib"))
          .groupBy("dst").agg(sum(col("contrib")).as("csum"))
          .select(col("dst").as("node"), expr("(csum * 85) DIV 100").as("pr"))
          .localCheckpoint()
      }
    }
    time("topk")(ranks.orderBy(col("pr").desc).limit(20).collect())
    spark.stop()
  }
}
