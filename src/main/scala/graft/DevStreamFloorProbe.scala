package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only STRUCTURAL breakdown of the per-entry streaming bench floor
  * (VERDICT r13 item 5): attributes one entry's fixed cost to engine
  * phases via StreamingQueryProgress.durationMs and tests the candidate
  * levers — RocksDB state store, tmpfs checkpoint (fsync theory),
  * disabled state-store maintenance, and a STATELESS drain (isolates
  * micro-batch machinery from state-store init). Not part of the driver
  * contract.
  */
object DevStreamFloorProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.streaming.minBatchesToRetain", "1")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val path = graft.fixtures.HudiFixtureBuilder.morPath(sfDir)

    def statefulQuery() = {
      val stream = spark.readStream.format("hudi-graft").load(path)
      graft.streaming.StreamOps.latestByKey(
        stream.withColumn("commit_ord", col("_hoodie_commit_time").cast("long"))
          .select("o_orderkey", "o_orderstatus", "commit_ord"),
        Seq("o_orderkey"), "commit_ord")
    }
    def statelessQuery() =
      spark.readStream.format("hudi-graft").load(path)
        .select("o_orderkey", "o_orderstatus")

    var n = 0
    def run(label: String, stateful: Boolean, confs: Map[String, String],
        checkpointBase: Option[String]): Unit = {
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        for (i <- 1 to 3) {
          n += 1
          val sink = s"floor_probe_$n"
          val t0 = System.nanoTime()
          val df = if (stateful) statefulQuery() else statelessQuery()
          var w = df.writeStream.outputMode("append").format("memory")
            .trigger(Trigger.AvailableNow()).queryName(sink)
          checkpointBase.foreach(b => w = w.option("checkpointLocation", s"$b/$sink"))
          val q = w.start()
          val tStart = System.nanoTime()
          q.awaitTermination()
          val tDone = System.nanoTime()
          q.stop()
          val phases = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
          var batches = 0
          for (p <- q.recentProgress) {
            batches += 1
            p.durationMs.forEach((k, v) => phases(k) += v.longValue())
          }
          val phaseStr = phases.toSeq.sortBy(-_._2)
            .map { case (k, v) => s"$k=${v}ms" }.mkString(" ")
          println(f"[$label run$i] wall=${(tDone - t0) / 1e9}%.2fs " +
            f"startup=${(tStart - t0) / 1e9}%.2fs batches=$batches $phaseStr")
        }
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    run("baseline-hdfsstate", stateful = true, Map.empty, None)
    run("rocksdb", stateful = true, Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"), None)
    run("tmpfs-checkpoint", stateful = true, Map.empty, Some("/dev/shm/graft_floor_ckpt"))
    run("no-maintenance", stateful = true, Map(
      "spark.sql.streaming.stateStore.maintenanceInterval" -> "3600s"), None)
    run("stateless", stateful = false, Map.empty, None)
    run("stateless-tmpfs", stateful = false, Map.empty, Some("/dev/shm/graft_floor_ckpt2"))
    spark.stop()
  }
}
