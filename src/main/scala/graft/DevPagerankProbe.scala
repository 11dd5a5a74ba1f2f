package graft

import org.apache.spark.sql.SparkSession

/** Dev-only (r16): measure graph_pagerank's loop time as a function of the
  * iteration relation's partition count, by sweeping the data-bounded
  * parallelism floor (graft.pagerank.min.partition.bytes). Each setting
  * rebuilds the session-shared prep (dropCaches between settings) so the
  * partitioning actually changes. Not part of the driver contract.
  *
  * Usage: runMain graft.DevPagerankProbe <sfDir> <minPartBytes1,minPartBytes2,...>
  */
object DevPagerankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val settings = (if (args.length > 1) args(1) else "262144,2097152,8388608,33554432,1073741824")
      .split(",").map(_.trim.toLong)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries("graph_pagerank")
    try fn(spark, sfDir).count() // warmup (codegen, parquet footers)
    catch { case e: Throwable => System.err.println(s"[prprobe] warmup failed: $e") }
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "5").toInt
    for (mpb <- settings) {
      System.setProperty("graft.pagerank.min.partition.bytes", mpb.toString)
      queries.GraphOps.dropCaches(spark) // force prep rebuild under the new floor
      val times = (1 to runs).map { pass =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prprobe] minPartBytes=$mpb%-12d pass$pass rows=$n ${dt}%.3f s")
        dt
      }
      println(f"[prprobe] minPartBytes=$mpb%-12d MIN ${times.min}%.3f s (pass1 incl. prep ${times.head}%.3f s)")
    }
    spark.stop()
  }
}
