package graft.sources

import graft.SparkTestBase
import graft.table.Fixtures

/** Structured Streaming over the connector: the first micro-batch of a
  * stream covers the whole commit history (incremental from the earliest
  * sentinel), matching the reference's streaming_queries expectation that
  * batches concatenate to the snapshot (table_read_tests.rs streaming
  * modules).
  */
class StreamingReadSpec extends SparkTestBase {

  private lazy val cowV6 =
    Fixtures.table("sample_table/cow/v6_simplekeygen_nonhivestyle.zip", "v6_simplekeygen_nonhivestyle")

  private lazy val morV8 =
    Fixtures.table("quickstart_trips_table/mor/avro/v8_trips_8i3u1d.zip", "v8_trips_8i3u1d")

  test("readStream over a MOR table merges within each micro-batch") {
    assume(morV8.isDefined)
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    val q = spark.readStream.format("hudi-graft").load(morV8.get)
      .selectExpr("rider", "fare")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => out.add((r.getString(0), r.getDouble(1))))
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = out.toArray(Array.empty[(String, Double)])
    // one batch covering all commits = the merged snapshot (deletes applied)
    val riders = rows.map(_._1).toSet
    assert(!riders.contains("rider-F") && !riders.contains("rider-J"))
    assert(rows.toMap.get("rider-G").contains(0.0))
  }

  test("readStream micro-batch covers the table's commit history") {
    assume(cowV6.isDefined)
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Boolean)]()
    val q = spark.readStream.format("hudi-graft").load(cowV6.get)
      .selectExpr("id", "isActive")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => out.add((r.getInt(0), r.getBoolean(1))))
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = out.toArray(Array.empty[(Int, Boolean)]).toSet
    // all 4 records' final versions flow through (id 1 appears for both
    // commits — its insert version and its update version are both
    // incremental changes)
    assert(rows.map(_._1) == Set(1, 2, 3, 4))
    assert(rows.contains((1, false))) // the update version is present
  }
}
