package graft

import org.apache.spark.sql.SparkSession

/** Dev-only (r16, VERDICT item 8): decompose the ~0.1-0.2 s per-entry
  * session floor. For each probe: N warm passes, report min. Splits the
  * floor into (a) pure job scheduling (range(1).count), (b) full bench
  * methodology (fn rebuilt per pass: analysis+optimization+codegen-cache
  * lookup+execution), (c) plan reuse (df built once, count() per pass:
  * execution only), (d) plan construction alone (fn + executedPlan, no
  * action). Not part of the driver contract.
  *
  * Usage: runMain graft.DevFloorProbe <sfDir> <q1,q2,...>
  */
object DevFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = (if (args.length > 1) args(1) else "hudi_count_pushdown,q_scalar_subquery")
      .split(",").map(_.trim)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[floor] fixture build failed: $e") }
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"[floor] warmup failed: $e") }
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "7").toInt
    def best(label: String)(f: => Unit): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[floor] $label%-44s min ${ts.min}%.4f s  med ${ts.sorted.apply(runs / 2)}%.4f s")
    }
    best("range(1).count  [pure job floor]")(spark.range(1).count())
    best("range(1e6).groupBy.count  [1-exchange floor]") {
      spark.range(1000000).selectExpr("id % 7 AS k").groupBy("k").count().count()
    }
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // per-entry warm (codegen cache, file index)
      best(s"$name  [fn+count, bench shape]")(fn(spark, sfDir).count())
      best(s"$name  [plan construction only]") {
        fn(spark, sfDir).queryExecution.executedPlan
      }
      val df = fn(spark, sfDir)
      df.count()
      best(s"$name  [count over prebuilt df]")(df.count())
    }
    spark.stop()
  }
}
