package graft.fs

import graft.SparkTestBase
import graft.table.{Fixtures, HudiTable}
import org.apache.spark.sql.functions.col

/** As-of log pruning (FsView.pruneLogsAsOf) against the reference's real
  * v8 trips bytes: 1 insert deltacommit (base parquet per city), then
  * update deltacommits writing log files NAMED with their own request ts
  * (the v8 naming rule the prune keys on), a delete, and a compaction.
  *
  *  - as-of the FIRST commit, every later log drops from the plan, the
  *    slices are log-free, and the rows equal reading the first commit's
  *    base files directly (independent ground truth);
  *  - that log-free as-of plan serves COUNT(*) as a metadata-only
  *    LocalScan — the as-of aggregate pushdown the prune unlocks;
  *  - a rollback/restore instant PAST the as-of point (any state) makes
  *    the prune stand down — command blocks may target earlier instants
  *    and must stay readable;
  *  - v6 tables never prune (their log names carry the BASE instant, so
  *    a name proves nothing about block instants).
  */
class AsOfLogPruneSpec extends SparkTestBase {

  private lazy val morV8 =
    Fixtures.table("quickstart_trips_table/mor/avro/v8_trips_8i3u1d.zip", "v8_trips_8i3u1d")

  test("as-of plan drops later-named logs and matches the base files' rows") {
    assume(morV8.isDefined)
    val t = HudiTable(spark, morV8.get)
    val ts1 = t.timeline.completedInstants.head.timestamp
    val latest = t.timeline.latestCommitTimestamp.get
    assert(ts1 < latest)
    // plan shape: as-of ts1 slices are log-free; latest slices are not
    // (later deltacommit logs attach until the compaction's new base)
    val asOfSlices = t.fsView.slicesAsOf(ts1)
    assert(asOfSlices.nonEmpty && asOfSlices.forall(_.logFiles.isEmpty),
      s"as-of first commit must plan log-free slices: $asOfSlices")
    // rows through the full read path == the first commit's base files
    // read directly (the prune must not change WHAT is read, only skip
    // bytes the range filter would discard)
    val asOf = spark.read.format("hudi-graft").option("as.of.timestamp", ts1)
      .load(morV8.get).select("uuid", "rider", "fare")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).sorted
    val basePaths = asOfSlices.flatMap(_.baseFile).map(_.path)
    val direct = spark.read.parquet(basePaths: _*).select("uuid", "rider", "fare")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).sorted
    assert(asOf.sameElements(direct))
    assert(asOf.length == 8, s"first trips commit inserted 8 rows, got ${asOf.length}")
  }

  test("log-free as-of plan serves COUNT(*) as a metadata-only LocalScan") {
    assume(morV8.isDefined)
    val t = HudiTable(spark, morV8.get)
    val ts1 = t.timeline.completedInstants.head.timestamp
    val agg = spark.read.format("hudi-graft").option("as.of.timestamp", ts1)
      .load(morV8.get)
      .agg(org.apache.spark.sql.functions.count(col("*")).as("n"))
    assert(agg.queryExecution.executedPlan.toString().contains("LocalTableScan"),
      s"pruned as-of aggregate must push down: ${agg.queryExecution.executedPlan}")
    assert(agg.head.getLong(0) == 8L)
  }

  test("a rollback past the as-of point makes the prune stand down") {
    assume(morV8.isDefined)
    val src = java.nio.file.Paths.get(morV8.get)
    val dst = java.nio.file.Files.createTempDirectory("graft_asof_rb").resolve("t")
    // copy the extracted table, then fabricate a completed rollback AFTER
    // the first commit
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(src).iterator().asScala.foreach { p =>
      val q = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(q)
      else java.nio.file.Files.copy(p, q)
    }
    val t0 = HudiTable(spark, dst.toString)
    val ts1 = t0.timeline.completedInstants.head.timestamp
    val tlDir = java.nio.file.Paths.get(t0.timeline.dir.toUri.getPath)
    java.nio.file.Files.write(
      tlDir.resolve("99990101000000000_99990101000000001.rollback"),
      Array.emptyByteArray)
    val t = HudiTable(spark, dst.toString) // fresh timeline listing
    assert(t.timeline.rollbackLikeTimestamps.exists(_ > ts1))
    val slices = t.fsView.slicesAsOf(ts1)
    assert(slices.exists(_.logFiles.exists(_.timestamp > ts1)),
      "prune must stand down when a rollback exists past the as-of point")
    // and the read still returns the correct as-of rows — the reader's
    // range filter remains authoritative when planning keeps the logs
    val n = spark.read.format("hudi-graft").option("as.of.timestamp", ts1)
      .load(dst.toString).count()
    assert(n == 8L)
  }

  test("real v9 rollback bytes: the raw-listing detector sees the rollback instant") {
    val p = Fixtures.table("sample_table/mor/avro/v9_nonpartitioned_rollback.zip",
      "v9_nonpartitioned_rollback", "v9_rb_prune")
    assume(p.isDefined)
    val t = HudiTable(spark, p.get)
    val ts1 = t.timeline.completedInstants.head.timestamp
    val latest = t.timeline.latestCommitTimestamp.get
    // the rollback is not a loadable instant (never in completedInstants)
    // but the raw listing must surface it, mid-timeline, so any as-of
    // before it stands the prune down
    assert(t.timeline.completedInstants.forall(i => i.action != "rollback"))
    val rb = t.timeline.rollbackLikeTimestamps
    assert(rb.nonEmpty && rb.forall(ts => ts > ts1 && ts < latest),
      s"real rollback instant must list between $ts1 and $latest, got $rb")
    // as-of the first commit still reads exactly that commit's base file
    val asOf = spark.read.format("hudi-graft").option("as.of.timestamp", ts1)
      .load(p.get).select("txn_id").collect().map(_.getString(0)).sorted
    val basePaths = t.fsView.slicesAsOf(ts1).flatMap(_.baseFile).map(_.path)
    val direct = spark.read.parquet(basePaths: _*)
      .select("txn_id").collect().map(_.getString(0)).sorted
    assert(asOf.nonEmpty && asOf.sameElements(direct))
  }

  test("v6 tables never prune: log names carry the base instant") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val t = HudiTable(spark, graft.fixtures.HudiFixtureBuilder.morPath(sfDir))
    val ts1 = t.timeline.completedInstants.head.timestamp
    // the v6 fixture's T2/T3 logs are named with the T1 base instant —
    // they stay attached to the as-of plan (and the reader's block range
    // filter drops their content), exactly the documented v6 behavior
    val slices = t.fsView.slicesAsOf(ts1)
    assert(slices.exists(_.logFiles.nonEmpty),
      "v6 as-of plan must keep base-named logs attached")
  }
}
