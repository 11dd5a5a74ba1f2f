package graft

import org.apache.spark.sql.SparkSession

/** Dev-only (r15 optimization round): batch plan-dumper + isolated timer.
  *
  * Usage: runMain graft.DevPlanDump <outDir> <tag> <sfDir> <q1,q2,...>
  *
  * For each named SparkEntry query: writes `<outDir>/<name>_<tag>.txt`
  * with the `.explain("formatted")` physical plan, then times `count()`
  * (the Bench methodology) over N passes (SPARK_GRAFT_RUNS, default 5)
  * printing per-pass and min times. One JVM for the whole list so the
  * 20 s session startup amortizes. Not part of the driver contract.
  */
object DevPlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val sfDir = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(outDir)
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
    catch { case e: Throwable => System.err.println(s"[plandump] fixture build failed: $e") }
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"[plandump] warmup failed: $e") }
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "5").toInt
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name (valid: ${SparkEntry.queries.keys.toSeq.sorted.take(5).mkString(", ")} ...)"))
      spark.sparkContext.setJobDescription(s"plandump:$name")
      // plan text via the captured explain string (not stdout)
      val df = fn(spark, sfDir)
      val planTxt =
        try df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"explain failed: $e" }
      java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
        planTxt.getBytes("UTF-8"))
      val times = (1 to runs).map { pass =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[plandump] $name%-32s pass$pass rows=$n%-8d ${dt}%.3f s")
        dt
      }
      println(f"[plandump] $name%-32s MIN ${times.min}%.3f s  (plan: ${name}_$tag.txt)")
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
