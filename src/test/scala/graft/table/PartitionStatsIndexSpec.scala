package graft.table

import graft.SparkTestBase
import graft.fs.{PartitionFilter, PartitionPruner, StatsPartitionPruner}
import org.apache.spark.sql.functions.{col, max}
import org.apache.spark.sql.types._

/** Partition-stats index reader against the reference's REAL v8 trips
  * fixture bytes (type=6 records, fileName = partition path), plus the
  * pre-listing partition pruner it feeds.
  */
class PartitionStatsIndexSpec extends SparkTestBase {

  private lazy val trips =
    Fixtures.table("quickstart_trips_table/mor/avro/v8_trips_8i3u1d.zip", "v8_trips_8i3u1d")

  test("decodes real partition_stats entries keyed by partition path") {
    assume(trips.isDefined)
    val conf = new org.apache.hadoop.conf.Configuration()
    val stats = PartitionStatsIndex.load(trips.get, conf)
    assert(stats.keySet == Set("city=chennai", "city=san_francisco", "city=sao_paulo"))
    // the driver column carries string ranges per partition
    for ((_, cols) <- stats) {
      val (mn, mx) = cols("driver")
      assert(mn.asInstanceOf[String].startsWith("driver-"))
      assert(mn.compareTo(mx) <= 0)
    }
    // san_francisco's real range is driver-K..driver-O (dumped from the
    // fixture's HFile) — spot-check exact decode
    assert(stats("city=san_francisco")("driver") ==
      ("driver-K".asInstanceOf[Comparable[Any]], "driver-O".asInstanceOf[Comparable[Any]]))
  }

  test("advertisement gate reads hoodie.table.metadata.partitions") {
    assume(trips.isDefined)
    val t = HudiTable(spark, trips.get)
    assert(PartitionStatsIndex.isAvailable(t.config))
    assert(t.partitionStatsForPruning.nonEmpty)
  }

  test("stats pruner excludes partitions whose ranges disprove the filter") {
    assume(trips.isDefined)
    val t = HudiTable(spark, trips.get)
    val schema = StructType(Seq(StructField("driver", StringType)))
    // driver < "driver-F": chennai (driver-S) and sao_paulo (driver-Q)
    // cannot match; san_francisco (driver-K..O) cannot either — but
    // driver <= "driver-N" keeps san_francisco only
    val lt = new StatsPartitionPruner(PartitionPruner.trivial,
      Seq(PartitionFilter("driver", "<=", Seq("driver-N"))),
      schema, t.partitionStatsForPruning)
    assert(lt.shouldInclude("city=san_francisco"))
    assert(!lt.shouldInclude("city=chennai"))
    assert(!lt.shouldInclude("city=sao_paulo"))
    // fail-open: a partition absent from the stats map is kept
    assert(lt.shouldInclude("city=unknown"))
    // fail-open: a column without entries is kept
    val other = new StatsPartitionPruner(PartitionPruner.trivial,
      Seq(PartitionFilter("nosuchcol", "<", Seq("x"))),
      StructType(Seq(StructField("nosuchcol", StringType))),
      t.partitionStatsForPruning)
    assert(other.shouldInclude("city=chennai"))
  }

  test("stats pruner prunes on date-typed partition stats via typed literals") {
    // DateWrapper entries unwrap to epoch-day Ints; a DateType predicate
    // (typed java.sql.Date literal, or the unambiguous string form) must
    // prune partitions whose date ranges disprove it
    val schema = StructType(Seq(StructField("event_date", DateType)))
    def day(s: String): Int = java.time.LocalDate.parse(s).toEpochDay.toInt
    def r(lo: String, hi: String) = Map("event_date" ->
      (Int.box(day(lo)).asInstanceOf[Comparable[Any]],
        Int.box(day(hi)).asInstanceOf[Comparable[Any]]))
    val stats = Map(
      "dt=2024-01" -> r("2024-01-01", "2024-01-31"),
      "dt=2024-02" -> r("2024-02-01", "2024-02-29"),
      "dt=2024-03" -> r("2024-03-01", "2024-03-31"))
    val typedLit = java.sql.Date.valueOf("2024-02-10")
    val p = new StatsPartitionPruner(PartitionPruner.trivial,
      Seq(PartitionFilter("event_date", ">", Seq("2024-02-10"), typed = Seq(typedLit))),
      schema, stats)
    assert(!p.shouldInclude("dt=2024-01"))
    assert(p.shouldInclude("dt=2024-02"))
    assert(p.shouldInclude("dt=2024-03"))
    // string-only literal parses too (dates are zone-unambiguous)
    val ps = new StatsPartitionPruner(PartitionPruner.trivial,
      Seq(PartitionFilter("event_date", "<", Seq("2024-02-01"))), schema, stats)
    assert(ps.shouldInclude("dt=2024-01"))
    assert(!ps.shouldInclude("dt=2024-02"))
    assert(!ps.shouldInclude("dt=2024-03"))
  }

  test("pstats fixture: key-range scan plans only surviving partitions, result exact") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val path = graft.fixtures.HudiFixtureBuilder.pstatsPath(sfDir)
    val t = HudiTable(spark, path)
    assert(t.partitionStatsForPruning.size == 4)

    val ordersDf = spark.read.parquet(s"$sfDir/orders.parquet")
    val maxKey = ordersDf.agg(max(col("o_orderkey"))).head.getLong(0)
    val boundary = maxKey * 3 / 4

    val df = spark.read.format("hudi-graft").load(path)
      .filter(col("o_orderkey") > boundary)
    // quartile split: partitions g=0 and g=1 end well below 3/4·max, so
    // the plan must carry at most 2 of the 4 single-slice partitions
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("1 slices") || plan.contains("2 slices"),
      s"partition_stats pruning did not engage: $plan")

    val got = df.select("o_orderkey").collect().map(_.getLong(0)).sorted
    val exp = ordersDf.filter(col("o_orderkey") > boundary)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(exp))
  }

  test("time-travel reads prune from as-of stats when the MDT mirrors the instant") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val path = graft.fixtures.HudiFixtureBuilder.pstatsPath(sfDir)
    val ordersDf = spark.read.parquet(s"$sfDir/orders.parquet")
    val maxKey = ordersDf.agg(max(col("o_orderkey"))).head.getLong(0)
    val boundary = maxKey * 3 / 4
    val t = HudiTable(spark, path)
    val plain = t.statsPrunerFor(Nil, Nil)
    assert(plain.isInstanceOf[PartitionPruner]) // no data filters -> no stats layer
    val layered = t.statsPrunerFor(Nil,
      Seq(PartitionFilter("o_orderkey", ">", Seq(boundary.toString))))
    assert(layered.isInstanceOf[StatsPartitionPruner])
    // as-of T1 = the MDT's own commit: stats-as-of apply, same plan as
    // the latest snapshot, result exact
    val tt = spark.read.format("hudi-graft")
      .option("as.of.timestamp", graft.fixtures.HudiFixtureBuilder.T1)
      .load(path)
      .filter(col("o_orderkey") > boundary)
    val ttPlan = tt.queryExecution.executedPlan.toString()
    assert(ttPlan.contains("1 slices") || ttPlan.contains("2 slices"),
      s"as-of stats pruning did not engage: $ttPlan")
    val got = tt.select("o_orderkey").collect().map(_.getLong(0)).sorted
    val exp = ordersDf.filter(col("o_orderkey") > boundary)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(exp))
  }

  test("real trips: latest reads prune from the compaction-written index, as-of fails open") {
    assume(trips.isDefined)
    def slices(p: String): Int =
      "(\\d+) slices".r.findFirstMatchIn(p).map(_.group(1).toInt).getOrElse(-1)
    // LATEST read: the index (written by the MDT's own ...30942
    // compaction, above the ...30911 data tip) serves pruning — driver <=
    // 'driver-O' disproves chennai (driver-S) and sao_paulo (driver-Q)
    val latest = spark.read.format("hudi-graft").load(trips.get)
      .filter(col("driver") <= "driver-O")
    val full = spark.read.format("hudi-graft").load(trips.get)
    val fullCount = slices(full.queryExecution.executedPlan.toString())
    val latestCount = slices(latest.queryExecution.executedPlan.toString())
    assert(latestCount > 0 && latestCount < fullCount,
      s"latest stats pruning did not engage: $latestCount vs $fullCount")
    // AS-OF at the data tip: the ONLY partition-stats file postdates it
    // (it was created by the 30942 compaction), so the as-of index load
    // finds no slice and the read fails OPEN — full plan, exact rows
    val t = HudiTable(spark, trips.get)
    val dataTip = t.timeline.latestCommitTimestamp.get
    val asOf = spark.read.format("hudi-graft")
      .option("as.of.timestamp", dataTip).load(trips.get)
      .filter(col("driver") <= "driver-O")
    assert(slices(asOf.queryExecution.executedPlan.toString()) == fullCount)
    val exp = full.filter(col("driver") <= "driver-O")
      .select("uuid").collect().map(_.getString(0)).toSet
    assert(latest.select("uuid").collect().map(_.getString(0)).toSet == exp)
    assert(asOf.select("uuid").collect().map(_.getString(0)).toSet == exp)
  }

  test("as-of stats gate: trusted when the MDT mirrors the instant, ignored when lagging") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = org.apache.hadoop.fs.FileSystem.get(conf)
    val src = new org.apache.hadoop.fs.Path(graft.fixtures.HudiFixtureBuilder.pstatsPath(sfDir))
    val tmp = new org.apache.hadoop.fs.Path(
      System.getProperty("java.io.tmpdir"), s"pstats_gate_${System.nanoTime()}")
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, tmp, false, conf)
    try {
      // doctor the copy's index: every partition claims range [1, 1], so
      // TRUSTED stats prune every partition for any key-range filter —
      // making "were the stats consulted?" directly observable
      graft.fixtures.HudiFixtureBuilder.writePartitionStatsFile(fs, tmp,
        (0 until 4).map(g => (s"g=$g", "o_orderkey", 1L, 1L)),
        graft.fixtures.HudiFixtureBuilder.T1)
      def scan(asOf: String) = spark.read.format("hudi-graft")
        .option("as.of.timestamp", asOf)
        .load(tmp.toString)
        .filter(col("o_orderkey") > 1)
      // MDT T1 mirrors data T1 -> bogus stats trusted -> everything pruned
      assert(scan(graft.fixtures.HudiFixtureBuilder.T1).count() == 0)
      // an empty data commit T2 with NO MDT commit: the index now LAGS
      // the resolved instant -> gate fails open -> exact result
      val out = fs.create(new org.apache.hadoop.fs.Path(tmp,
        s".hoodie/${graft.fixtures.HudiFixtureBuilder.T2}.commit"), true)
      out.write("""{"partitionToWriteStats":{},"compacted":false}""".getBytes("UTF-8"))
      out.close()
      val expected = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(col("o_orderkey") > 1).count()
      assert(scan(graft.fixtures.HudiFixtureBuilder.T2).count() == expected)
    } finally fs.delete(tmp, true)
  }
}
