package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** StreamOps over deterministic MemoryStream inputs: watermarked exact
  * dedup, tumbling-window aggregation, and the stateful latest-wins
  * upsert view (flatMapGroupsWithState), each driven to completion with
  * a memory sink.
  */
class StreamOpsSpec extends SparkTestBase {

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("dedupFirst keeps one row per key within the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    // key 1 repeats at a LATER event time too: per-key dedup must still
    // drop it (the old (key, eventTime) seen-set passed such records)
    in.addData((1L, ts(0), "a"), (1L, ts(0), "a-dup"), (2L, ts(1), "b"))
    in.addData((2L, ts(1), "b-dup"), (3L, ts(2), "c"), (1L, ts(3), "a-late-dup"))
    val deduped = StreamOps.dedupFirst(
      in.toDF.toDF("id", "event_ts", "payload"), Seq("id"), "event_ts", "10 minutes")
    runToMemory(deduped, "dedup_out")
    val rows = spark.table("dedup_out").select("id", "payload")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(!rows.map(_._2).contains("a-late-dup"),
      "a same-key record at a different event time must still dedup")
  }

  test("windowedCounts aggregates tumbling windows with a watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    in.addData((ts(1), "x", 10L), (ts(2), "x", 5L), (ts(3), "y", 1L),
      (ts(11), "x", 7L))
    // events far past the watermark close the earlier windows
    in.addData((ts(40), "x", 1L))
    val agg = StreamOps.windowedCounts(
      in.toDF.toDF("event_ts", "kind", "value"), "event_ts", "10 minutes",
      "5 minutes", Seq("kind"),
      Seq(count(lit(1)).as("n"), sum(col("value")).as("total")))
    runToMemory(agg, "win_out")
    val rows = spark.table("win_out")
      .select(col("window.start"), col("kind"), col("n"), col("total"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(rows.contains((ts(0), "x", 2L, 15L)))
    assert(rows.contains((ts(0), "y", 1L, 1L)))
    assert(rows.contains((ts(10), "x", 1L, 7L)))
  }

  test("latestByKey emits only when the per-key winner improves") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Long, String)]
    val latest = StreamOps.latestByKey(
      in.toDF.toDF("key", "ord", "payload"), Seq("key"), "ord")
    // feed micro-batches one at a time so per-batch emission is observable
    val q = latest.writeStream.outputMode("append").format("memory")
      .queryName("latest_out").start()
    try {
      in.addData((1L, 10L, "v1"), (2L, 5L, "w1"))
      q.processAllAvailable()
      in.addData((1L, 8L, "stale"), (1L, 20L, "v2")) // stale loses in-batch and vs state
      q.processAllAvailable()
      in.addData((2L, 5L, "w-equal")) // equal ordering does NOT replace
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("latest_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // emissions: (1,10,v1), (2,5,w1) from batch 1, then (1,20,v2); no
    // emission for stale or equal-ordering rows
    assert(out.toSet == Set((1L, 10L, "v1"), (2L, 5L, "w1"), (1L, 20L, "v2")))
    // the final state per key is the max-ordering row
    val finalPerKey = out.groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2)._3 }
    assert(finalPerKey == Map(1L -> "v2", 2L -> "w1"))
  }

  test("latestByKey composes over the hudi-graft streaming source") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val stream = spark.readStream.format("hudi-graft")
      .load(graft.fixtures.HudiFixtureBuilder.morPath(sfDir))
    // keep the latest version of each order key by commit time
    val latest = StreamOps.latestByKey(
      stream.withColumn("commit_ord", col("_hoodie_commit_time").cast("long"))
        .select("o_orderkey", "o_orderstatus", "commit_ord"),
      Seq("o_orderkey"), "commit_ord")
    runToMemory(latest, "hudi_latest_out")
    val updated = spark.table("hudi_latest_out")
      .filter(col("o_orderstatus") === "U").count()
    assert(updated > 0, "updated rows must surface through the stateful view")
  }
}
