package graft.sources

import graft.SparkTestBase
import graft.fixtures.HudiFixtureBuilder
import org.apache.spark.sql.streaming.Trigger

/** Streaming admission control: `stream.commits.per.batch` must split the
  * drain into bounded micro-batches (the Kafka maxOffsetsPerTrigger /
  * Delta maxFilesPerTrigger shape) without changing the union of emitted
  * rows — consecutive commit ranges partition the incremental row set.
  */
class StreamAdmissionSpec extends SparkTestBase {

  private def drain(opts: Map[String, String], sink: String): Int = {
    HudiFixtureBuilder.ensure(spark, sfDir)
    var reader = spark.readStream.format("hudi-graft")
    opts.foreach { case (k, v) => reader = reader.option(k, v) }
    val df = reader.load(HudiFixtureBuilder.morPath(sfDir))
    val q = df.writeStream.outputMode("append").format("memory")
      .trigger(Trigger.AvailableNow()).queryName(sink).start()
    try {
      q.awaitTermination()
      q.recentProgress.count(_.numInputRows > 0)
    } finally q.stop()
  }

  /** Latest emitted version per key (the state a latest-wins consumer
    * converges to).
    */
  private def latestState(sink: String): Map[Long, String] =
    spark.table(sink)
      .selectExpr("o_orderkey", "_hoodie_commit_time")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).max }

  test("stream.commits.per.batch bounds micro-batches, converging to the same state") {
    val allBatches = drain(Map.empty, "adm_all")
    val boundedBatches = drain(Map("stream.commits.per.batch" -> "1"), "adm_one")
    assert(allBatches == 1, s"unbounded AvailableNow should drain in one batch, got $allBatches")
    assert(boundedBatches > 1,
      s"one-commit-per-batch must take multiple micro-batches, got $boundedBatches")
    // bounded drains emit intermediate versions (one per range a key
    // changed in); a latest-wins consumer must still converge to the
    // same state on every surviving key
    val all = latestState("adm_all")
    val bounded = latestState("adm_one")
    assert(all.keySet.subsetOf(bounded.keySet))
    assert(all.forall { case (k, v) => bounded(k) == v },
      "latest version per surviving key must match the single-batch drain")
    // keys only the bounded drain saw are exactly the ones deleted by the
    // final commit: a single range spanning insert+delete emits nothing
    // for them, split ranges emit the pre-delete version (the reference's
    // incremental reads compose the same way; no delete/CDC emission)
    val extra = bounded.keySet -- all.keySet
    assert(extra.nonEmpty && extra.forall(_ % 97 == 0),
      s"extra keys must be the fixture's deleted keys, got ${extra.take(5)}")
  }

  test("stream.max.bytes.per.batch splits the drain by planned bytes, same converged state") {
    val allBatches = drain(Map.empty, "byt_all")
    assert(allBatches == 1)
    // a 1-byte cap forces every commit into its own batch (each commit's
    // planned slices dwarf it; the first commit of a batch always admits)
    val bounded = drain(Map("stream.max.bytes.per.batch" -> "1"), "byt_one")
    assert(bounded > 1,
      s"a 1-byte cap must split the drain into multiple micro-batches, got $bounded")
    // a cap far above the table size degenerates to the single batch
    val huge = drain(Map("stream.max.bytes.per.batch" -> (1L << 40).toString), "byt_huge")
    assert(huge == 1, s"an over-table byte cap must not split the drain, got $huge")
    // composition with the count cap: whichever cuts earlier wins
    val both = drain(Map(
      "stream.commits.per.batch" -> "10",
      "stream.max.bytes.per.batch" -> "1"), "byt_both")
    assert(both == bounded,
      s"byte cap must still bound under a looser count cap: $both vs $bounded")
    // latest-wins convergence matches the single-batch drain (the same
    // range-partition argument as the count-cap test)
    val all = latestState("byt_all")
    val b = latestState("byt_one")
    assert(all.keySet.subsetOf(b.keySet))
    assert(all.forall { case (k, v) => b(k) == v },
      "latest version per surviving key must match the single-batch drain")
  }

  test("byte-capped drain is checkpoint-replay stable") {
    HudiFixtureBuilder.ensure(spark, sfDir)
    val work = java.nio.file.Files.createTempDirectory("graft_byte_ckpt")
    val ckpt = work.resolve("ckpt").toString
    val out = work.resolve("out").toString
    // file sink (memory doesn't support checkpoint recovery): run-over-run
    // row growth in `out` is exactly what each drain emitted
    def run(): Long = {
      val df = spark.readStream.format("hudi-graft")
        .option("stream.max.bytes.per.batch", "1")
        .load(HudiFixtureBuilder.morPath(sfDir))
      val q = df.writeStream.outputMode("append").format("parquet")
        .option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      try { q.awaitTermination(); spark.read.parquet(out).count() }
      finally q.stop()
    }
    val first = run()
    assert(first > 0)
    // restart against the same checkpoint with no new commits: the
    // recovered offset equals the drained tip, so NOTHING re-emits —
    // bounded admission advanced the checkpoint exactly once per range
    val second = run()
    assert(second == first,
      s"checkpoint replay with no new commits must emit zero rows: $first -> $second")
  }

  test("latestOffset never regresses before the start offset") {
    // stream.start.timestamp ahead of the timeline tip: the first
    // latestOffset must return the start offset unchanged, not the tip —
    // a regressed checkpoint would later re-admit commits landing between
    // the tip and the configured start, which the user asked to skip
    HudiFixtureBuilder.ensure(spark, sfDir)
    val hudi = graft.table.HudiTable(spark, HudiFixtureBuilder.morPath(sfDir))
    val future = "99991231235959999"
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.singletonMap("stream.start.timestamp", future))
    val scan = new GraftScanBuilder(hudi, hudi.tableSchema, opts).build()
      .asInstanceOf[GraftScan]
    val stream = scan.toMicroBatchStream("unused").asInstanceOf[GraftMicroBatchStream]
    val start = stream.initialOffset()
    assert(start.json() == future)
    val next = stream.latestOffset(start, stream.getDefaultReadLimit)
    assert(next.json() == future,
      s"offset must not regress from $future to the timeline tip, got ${next.json()}")
  }

  test("stream.emit.deletes surfaces tombstones so bounded drains converge on deletes") {
    drain(Map("stream.commits.per.batch" -> "1", "stream.emit.deletes" -> "true"),
      "adm_tomb")
    val rows = spark.table("adm_tomb")
      .selectExpr("_hoodie_record_key", "o_orderkey", "o_orderstatus", "_hoodie_commit_time")
      .collect()
    // tombstones: meta key + delete commit populated, data columns null —
    // exactly the fixture's T3-deleted (%97) keys
    val tomb = rows.filter(_.isNullAt(1))
    assert(tomb.nonEmpty)
    assert(tomb.forall(r => r.getString(0).toLong % 97 == 0))
    assert(tomb.forall(r => r.getString(3) == HudiFixtureBuilder.T3))
    // tombstone-aware latest-wins converges to the true surviving key set
    // (the drift the option exists to prevent)
    val latest = rows.groupBy(_.getString(0)).map { case (k, vs) =>
      k.toLong -> Option(vs.maxBy(_.getString(3)).getString(2))
    }
    val survivors = latest.collect { case (k, Some(_)) => k }.toSet
    val expected = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey").collect().map(_.getLong(0))
      .filter(_ % 97 != 0).toSet
    assert(survivors == expected)
  }

  test("a snapshot read ignores stream.emit.deletes (tombstones need a commit range)") {
    HudiFixtureBuilder.ensure(spark, sfDir)
    val path = HudiFixtureBuilder.morPath(sfDir)
    val plain = spark.read.format("hudi-graft").load(path)
    val withOpt = spark.read.format("hudi-graft")
      .option("stream.emit.deletes", "true").load(path)
    // without the gate the whole delete history surfaces as null-data
    // rows in a plain snapshot, inflating it unboundedly
    assert(withOpt.count() == plain.count())
    assert(withOpt.filter("o_orderkey IS NULL").count() == 0L)
  }

  test("stream.start.timestamp skips history on first start") {
    drain(Map("stream.start.timestamp" -> HudiFixtureBuilder.T1), "adm_from_t1")
    val commits = spark.table("adm_from_t1")
      .selectExpr("_hoodie_commit_time").distinct()
      .collect().map(_.getString(0)).toSet
    assert(!commits.contains(HudiFixtureBuilder.T1),
      s"stream starting after T1 must not replay T1 rows, saw $commits")
    assert(commits.nonEmpty, "later commits must still be emitted")
  }
}
