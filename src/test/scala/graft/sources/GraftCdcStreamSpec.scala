package graft.sources

import graft.SparkTestBase
import graft.fixtures.HudiFixtureBuilder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming CDC: `readStream` with upstream's
  * `hoodie.datasource.query.incremental.format=cdc` serves the inferred
  * (op, ts_ms, before, after) feed through the V1 GraftCdcSource, with
  * offsets (commit timestamps) checkpointed like any other stream.
  */
class GraftCdcStreamSpec extends SparkTestBase {

  import HudiFixtureBuilder.{T1, T2, T3}

  private def orders() = spark.read.parquet(s"$sfDir/orders.parquet")

  private def drain(stream: DataFrame, sink: String, checkpoint: Option[String] = None): DataFrame = {
    spark.catalog.dropTempView(sink)
    val w = stream.writeStream.outputMode("append").format("memory")
      .trigger(Trigger.AvailableNow()).queryName(sink)
    val q = checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
    try q.awaitTermination() finally q.stop()
    spark.table(sink)
  }

  private def flat(df: DataFrame) = df
    .select(col("op"), col("ts_ms"),
      coalesce(col("before.o_orderkey"), col("after.o_orderkey")).as("k"),
      col("before.o_orderstatus").as("bs"), col("after.o_orderstatus").as("as"))
    .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
      Option(r.getString(3)), Option(r.getString(4)))).toSet

  test("the streamed feed equals the batch CDC feed over the full history") {
    HudiFixtureBuilder.ensure(spark, sfDir)
    val p = HudiFixtureBuilder.morPath(sfDir)
    val streamed = flat(drain(
      spark.readStream.format("hudi-graft")
        .option("hoodie.datasource.query.incremental.format", "cdc")
        .load(p),
      "graft_cdc_stream_full"))
    val batch = flat(CdcRead.changes(spark, p, None, Some(T3)))
    assert(streamed == batch && streamed.nonEmpty,
      s"stream-only=${(streamed -- batch).take(3)} batch-only=${(batch -- streamed).take(3)}")
    // sanity on shape: inserts at T1, updates at T2, deletes at T3
    val ops = streamed.groupBy(_._1).view.mapValues(_.size).toMap
    assert(ops.keySet == Set("i", "u", "d"), s"ops: $ops")
  }

  test("checkpoint replay: a restarted drain emits nothing new") {
    HudiFixtureBuilder.ensure(spark, sfDir)
    val p = HudiFixtureBuilder.morPath(sfDir)
    val ckpt = s"/root/repo/target/cdc_stream_ckpt_${System.nanoTime()}"
    // foreachBatch, not the memory sink: memory refuses checkpoint
    // recovery (not fault-tolerant), and recovery is exactly what this
    // test drives
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    def run(): Long = {
      seen.set(0)
      val q = spark.readStream.format("hudi-graft")
        .option("incremental.format", "cdc").load(p)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          seen.addAndGet(batch.count()); ()
        }.start()
      try q.awaitTermination() finally q.stop()
      seen.get()
    }
    val first = run()
    assert(first > 0)
    // same checkpoint, fresh query: offsets are at the tip, nothing admits
    val second = run()
    assert(second == 0, s"replay must admit nothing, got $second rows")
  }

  test("stream.start.timestamp: a fresh stream begins after the given commit") {
    HudiFixtureBuilder.ensure(spark, sfDir)
    val p = HudiFixtureBuilder.morPath(sfDir)
    val streamed = flat(drain(
      spark.readStream.format("hudi-graft")
        .option("incremental.format", "cdc")
        .option("stream.start.timestamp", T1)
        .load(p),
      "graft_cdc_stream_after_t1"))
    val batch = flat(CdcRead.changes(spark, p, Some(T1), Some(T3)))
    assert(streamed == batch && streamed.nonEmpty)
    assert(!streamed.exists(_._1 == "i"), "T1 inserts must be excluded")
  }

  test("V1 source offset math: per-commit admission once anchored") {
    HudiFixtureBuilder.ensure(spark, sfDir)
    val p = HudiFixtureBuilder.morPath(sfDir)
    case class TestOffset(ts: String)
        extends org.apache.spark.sql.execution.streaming.Offset {
      override def json(): String = ts
    }
    val src = new GraftCdcSource(spark, p, Map("stream.commits.per.batch" -> "1"))
    // unanchored (fresh stream / post-restart): the tip is offered whole
    assert(src.getOffset.map(_.json()) == Some(T3))
    // the first batch anchors the admission point (content equality with
    // the batch feed is the drain tests' job — a streaming frame cannot
    // be collected outside a streaming query; the checker forbids it)
    val b1 = src.getBatch(None, TestOffset(T1))
    assert(b1.isStreaming, "getBatch must return an isStreaming frame")
    assert(b1.schema.fieldNames.toSeq == Seq("op", "ts_ms", "before", "after"))
    // ...after which each offset advances exactly ONE commit timestamp
    assert(src.getOffset.map(_.json()) == Some(T2))
    src.getBatch(Some(TestOffset(T1)), TestOffset(T2))
    assert(src.getOffset.map(_.json()) == Some(T3))
    src.getBatch(Some(TestOffset(T2)), TestOffset(T3))
    // drained: the offer stays at the tip (no progress = no new batch)
    assert(src.getOffset.map(_.json()) == Some(T3))
    // and without the cap, the tip is offered immediately
    val unbounded = new GraftCdcSource(spark, p, Map.empty)
    assert(unbounded.getOffset.map(_.json()) == Some(T3))
    // byte cap (CommitAdmission shared with the DSv2 stream): a 1-byte
    // ceiling still admits exactly ONE commit per anchored offer (the
    // first always admits — progress guaranteed)
    val byteSrc = new GraftCdcSource(spark, p,
      Map("stream.max.bytes.per.batch" -> "1"))
    byteSrc.getBatch(None, TestOffset(T1))
    assert(byteSrc.getOffset.map(_.json()) == Some(T2),
      "an over-cap commit must still admit as its own batch")
  }

  test("the streamed schema is the CDC image schema") {
    HudiFixtureBuilder.ensure(spark, sfDir)
    val p = HudiFixtureBuilder.morPath(sfDir)
    val s = spark.readStream.format("hudi-graft")
      .option("incremental.format", "cdc").load(p)
    assert(s.isStreaming)
    assert(s.schema.fieldNames.toSeq == Seq("op", "ts_ms", "before", "after"))
    // and without the option the plain row stream is untouched
    val plain = spark.readStream.format("hudi-graft").load(p)
    assert(plain.isStreaming && plain.schema.fieldNames.contains("o_orderkey"))
  }
}
