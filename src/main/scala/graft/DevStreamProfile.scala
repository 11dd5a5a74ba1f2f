package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase timer for the hudi_stream_latest harness: splits wall
  * time into stream-drain vs final-agg per invocation. Not part of the
  * driver contract.
  */
object DevStreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    for (parts <- Seq("8", "4", "2"); retain <- Seq("100", "1"); i <- 1 to 3) {
      val t0 = System.nanoTime()
      val stream = spark.readStream.format("hudi-graft")
        .load(graft.fixtures.HudiFixtureBuilder.morPath(sfDir))
      val latest = graft.streaming.StreamOps.latestByKey(
        stream.withColumn("commit_ord", col("_hoodie_commit_time").cast("long"))
          .select("o_orderkey", "o_orderstatus", "commit_ord"),
        Seq("o_orderkey"), "commit_ord")
      val sink = s"dev_stream_sink_${parts}_${retain}_$i"
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.conf.set("spark.sql.streaming.minBatchesToRetain", retain)
      val q =
        try latest.writeStream.outputMode("append").format("memory")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .queryName(sink).start()
        finally spark.conf.set("spark.sql.shuffle.partitions", saved)
      q.awaitTermination()
      val t1 = System.nanoTime()
      q.stop()
      val t2 = System.nanoTime()
      val n = spark.table(sink)
        .groupBy("o_orderkey")
        .agg(max(struct(col("commit_ord"), col("o_orderstatus"))).as("m"))
        .count()
      val t3 = System.nanoTime()
      println(f"parts=$parts retain=$retain run$i drain=${(t1 - t0) / 1e9}%.2f stop=${(t2 - t1) / 1e9}%.2f agg=${(t3 - t2) / 1e9}%.2f rows=$n")
    }
    spark.stop()
  }
}
