package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: attribute the ANN cold fixed cost (codegen vs AQE vs query).
  * Not part of the driver contract.
  */
object DevAnnProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val query = if (args.length > 1) args(1) else "embed_ann_topk"
    val codegen = sys.env.getOrElse("DEV_CODEGEN", "true")
    val aqe = sys.env.getOrElse("DEV_AQE", "true")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.codegen.wholeStage", codegen)
      .config("spark.sql.codegen.factoryMode",
        sys.env.getOrElse("DEV_FACTORY", "FALLBACK"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    t("warmup entry")(SparkEntry.entry(spark).count())
    t(s"$query cold")(SparkEntry.queries(query)(spark, sfDir).count())
    t(s"$query 2nd")(SparkEntry.queries(query)(spark, sfDir).count())
    spark.stop()
  }
}
