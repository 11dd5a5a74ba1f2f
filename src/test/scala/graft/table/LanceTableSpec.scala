package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** End-to-end reads of the reference's golden v9 LANCE tables (S7):
  * COW snapshot/time-travel, MOR merge over Lance base + avro logs,
  * the DSv2 and catalog surfaces, and the metadata COUNT pushdown.
  * Expected row sets derive from each fixture's sibling .sql script.
  */
class LanceTableSpec extends SparkTestBase {

  private lazy val tripsCow = Fixtures.table(
    "quickstart_trips_table/cow/v9_trips_lance.zip", "v9_trips_lance")
  private lazy val nonPart = Fixtures.table(
    "sample_table/cow/v9_lance_nonpartitioned.zip", "v9_lance_nonpartitioned")
  private lazy val morNonHive = Fixtures.table(
    "sample_table/mor/avro/v9_lance_nonhivestyle.zip", "v9_lance_nonhivestyle")

  test("cow trips snapshot: inserts + updates + delete + late inserts") {
    assume(tripsCow.isDefined)
    val t = HudiTable(spark, tripsCow.get)
    assert(t.isLance)
    val rows = t.snapshot().select("rider", "fare", "ts", "city").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getString(3))).toSet
    // 8 inserts − rider-F (deleted) + 4 late inserts = 11; A and G updated
    assert(rows.size == 11)
    assert(rows.contains(("rider-A", 0.0, 1695200000000L, "san_francisco")))
    assert(rows.contains(("rider-G", 0.0, 1695400000000L, "sao_paulo")))
    assert(!rows.exists(_._1 == "rider-F"))
    assert(rows.contains(("rider-M", 48.75, 1695800000001L, "san_francisco")))
    assert(rows.contains(("rider-L", 62.30, 1695800000004L, "chennai")))
  }

  test("v9 lance txns tables (nonpart + partitioned): the reference's own row set") {
    // the reference's assert_lance_txn_table_rows (table_read_tests.rs:
    // 2414-2449): 14 surviving TXN ids after updates/deletes/inserts,
    // TXN-002/005 deleted, TXN-001 updated to 'reversal', exact ts
    // checks — and for the partitioned variant, the region values
    def checkTxns(zip: String, name: String, dir: String, partitioned: Boolean): Boolean = {
      Fixtures.table(zip, name, dir).map { p =>
        val t = HudiTable(spark, p)
        assert(t.isLance)
        val cols = if (partitioned) Seq("txn_id", "txn_type", "txn_ts", "region")
                   else Seq("txn_id", "txn_type", "txn_ts")
        val rows = t.snapshot().select(cols.head, cols.tail: _*).collect()
          .map(r => r.getString(0) ->
            (r.getString(1), r.getLong(2), if (partitioned) r.getString(3) else null))
          .toMap
        assert(rows.keySet == Set(
          "TXN-001", "TXN-003", "TXN-004", "TXN-006", "TXN-007", "TXN-008", "TXN-009",
          "TXN-010", "TXN-011", "TXN-012", "TXN-013", "TXN-014", "TXN-015", "TXN-016"),
          s"$name surviving ids: ${rows.keySet.toSeq.sorted}")
        assert(!rows.contains("TXN-002") && !rows.contains("TXN-005"))
        assert(rows("TXN-001")._1 == "reversal" && rows("TXN-001")._2 == 1700100000001L)
        assert(rows("TXN-007")._2 == 1700300000007L)
        assert(rows("TXN-016")._1 == "debit")
        if (partitioned) {
          assert(rows("TXN-001")._3 == "us" && rows("TXN-004")._3 == "eu")
          assert(rows("TXN-007")._3 == "apac" && rows("TXN-016")._3 == "apac")
        }
        true
      }.getOrElse(false)
    }
    val ran =
      checkTxns("sample_table/cow/v9_lance_txns_nonpart.zip",
        "v9_lance_txns_nonpart", "lance_txns_nonpart", partitioned = false) |
      checkTxns("sample_table/cow/v9_lance_txns_simple.zip",
        "v9_lance_txns_simple", "lance_txns_simple_full", partitioned = true)
    assume(ran)
  }

  test("cow trips partition pruning plans only the filtered city") {
    assume(tripsCow.isDefined)
    val t = HudiTable(spark, tripsCow.get)
    val df = spark.read.format("hudi-graft").load(tripsCow.get)
      .where("city = 'chennai'").select("rider", "fare")
    val rows = df.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(rows == Set(("rider-I", 41.06), ("rider-J", 17.85), ("rider-L", 62.30)))
  }

  test("nonpartitioned snapshot: updated list column and deletes") {
    assume(nonPart.isDefined)
    val t = HudiTable(spark, nonPart.get)
    val rows = t.snapshot().select("id", "score", "tags", "updated_at").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getSeq[String](2).toList, r.getLong(3)))
      .toSet
    assert(rows.map(_._1) == Set(1, 2, 3, 5, 6, 7, 8, 9, 10)) // id 4 deleted
    assert(rows.contains((1, 0.96, List("cnn", "resnet", "imagenet"), 1700100000000L)))
    assert(rows.contains((2, 0.93, List("bert", "transformer", "finetuned"), 1700100000001L)))
    assert(rows.contains((10, 0.97, List("sam", "segmentation", "foundation"), 1700200000001L)))
  }

  test("nonpartitioned time travel pins the insert commit") {
    assume(nonPart.isDefined)
    val t = HudiTable(spark, nonPart.get)
    val first = t.timeline.completedInstants.head.timestamp
    val rows = t.snapshot(asOf = Some(first)).select("id", "score").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(rows.map(_._1) == (1 to 8).toSet)
    assert(rows.contains((1, 0.92))) // pre-update score
  }

  test("MOR merges avro delta logs over Lance base files") {
    assume(morNonHive.isDefined)
    val t = HudiTable(spark, morNonHive.get)
    assert(t.isLance && t.isMor)
    val rows = t.snapshot().select("event_id", "payload", "event_ts").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    // the fixture writer materialized only the FIRST update's log block —
    // the evt-002 update and the GDPR delete commits carry EMPTY write
    // stats (verified in the deltacommit avro). The reference's own test
    // (table_read_tests.rs test_v9_lance_nonhivestyle_mor_snapshot_...)
    // asserts exactly this: all 14 events, evt-001 updated, evt-002 not.
    assert(rows.size == 14)
    assert(rows("evt-001") == ("""{"page": "/home", "session": "sess-abc123"}""", 1700000000001L))
    assert(rows("evt-002") == ("""{"button": "signup"}""", 1700000060000L))
    // untouched base rows survive the merge
    assert(rows("evt-004") == ("""{"item": "pro-plan", "amount": 49.99}""", 1700000180000L))
    assert(rows("evt-013") == ("""{"feature": "dashboard"}""", 1700259200000L))
  }

  test("MOR read-optimized serves the Lance base files only") {
    assume(morNonHive.isDefined)
    val df = spark.read.format("hudi-graft")
      .option("read.optimized", "true").load(morNonHive.get)
      .select("event_id", "payload")
    val rows = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // the evt-001 update lives in the log: RO must show the BASE payload
    assert(rows.size == 14)
    assert(rows("evt-001") == """{"page": "/home"}""")
    assert(rows.contains("evt-007"))
  }

  test("MOR trips: lance base + avro log merge matches the reference") {
    val trips = Fixtures.table(
      "quickstart_trips_table/mor/avro/v9_trips_lance.zip", "v9_trips_lance", "v9_trips_lance_mor")
    assume(trips.isDefined)
    val t = HudiTable(spark, trips.get)
    assert(t.isLance && t.isMor)
    val rows = t.snapshot().select("rider", "fare", "ts").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // reference table_read_tests.rs: 12 riders (only the materialized
    // log update applies — rider-A; F's delete and G's update wrote no
    // log blocks in this fixture)
    assert(rows.keySet == Set("rider-A", "rider-C", "rider-D", "rider-E",
      "rider-F", "rider-G", "rider-I", "rider-J", "rider-M", "rider-N",
      "rider-O", "rider-P"))
    assert(rows("rider-A") == ((0.0, 1695200000000L)))
    assert(rows("rider-C")._1 == 27.70)
    assert(rows("rider-G")._1 == 43.40)
  }

  test("extension fallback reads Lance without the format config") {
    // the reference strips hoodie.table.base.file.format and still reads
    // the table by file extension — mirror that on a fresh extraction
    val fresh = Fixtures.table(
      "sample_table/cow/v9_lance_nonpartitioned.zip",
      "v9_lance_nonpartitioned", "v9_lance_nonpart_noformat")
    assume(fresh.isDefined)
    val props = java.nio.file.Paths.get(fresh.get, ".hoodie", "hoodie.properties")
    val stripped = new String(java.nio.file.Files.readAllBytes(props), "UTF-8")
      .linesIterator.filterNot(_.startsWith("hoodie.table.base.file.format="))
      .mkString("\n")
    java.nio.file.Files.write(props, stripped.getBytes("UTF-8"))
    val t = HudiTable(spark, fresh.get)
    assert(t.isLance, "extension fallback must detect Lance")
    assert(t.snapshot().count() == 9L)
  }

  test("COUNT(*) over a Lance table is served from file metadata") {
    assume(tripsCow.isDefined)
    val df = spark.read.format("hudi-graft").load(tripsCow.get)
      .groupBy().count()
    // the pushdown plans a LocalScan over lance footers — no row scan
    val plan = df.queryExecution.optimizedPlan.toString
    val n = df.collect()(0).getLong(0)
    assert(n == 11L)
    assert(plan.contains("GraftFooterAggScan") || !plan.contains("GraftScan"),
      s"COUNT should serve from metadata, got:\n$plan")
  }

  test("record-index point lookup plans a slice subset over Lance") {
    assume(nonPart.isDefined)
    // the fixture enables the record_index MDT partition; a key-equality
    // lookup must plan FEWER slices than the snapshot (index planning is
    // format-agnostic — it bounds which lance files are opened at all)
    val pt = spark.read.format("hudi-graft").load(nonPart.get)
      .where("id = 3").select("id", "name")
    val scanDesc = pt.queryExecution.executedPlan.toString
    assert(scanDesc.contains("1 slices"), s"point lookup should plan 1 slice:\n$scanDesc")
    assert(pt.collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((3, "feature-set-gamma")))
  }

  test("MIN/MAX over Lance falls back to a correct scan (no footer stats)") {
    assume(nonPart.isDefined)
    import org.apache.spark.sql.functions.{max, min}
    val row = spark.read.format("hudi-graft").load(nonPart.get)
      .agg(min("score"), max("score")).collect()(0)
    assert(row.getDouble(0) == 0.82 && row.getDouble(1) == 0.97)
  }

  test("SQL catalog time travel works over Lance") {
    assume(nonPart.isDefined)
    spark.conf.set("spark.sql.catalog.lance_cat",
      classOf[graft.sources.GraftCatalog].getName)
    val t = HudiTable(spark, nonPart.get)
    val first = t.timeline.completedInstants.head.timestamp
    // Spark's FOR TIMESTAMP AS OF takes a SQL timestamp; render the hudi
    // instant (yyyyMMddHHmmssSSS) as one
    val sqlTs = s"${first.substring(0, 4)}-${first.substring(4, 6)}-${first.substring(6, 8)} " +
      s"${first.substring(8, 10)}:${first.substring(10, 12)}:${first.substring(12, 14)}." +
      first.substring(14, 17)
    val n = spark.sql(
      s"SELECT COUNT(*) AS n FROM lance_cat.`${nonPart.get}` FOR TIMESTAMP AS OF '$sqlTs'"
    ).collect()(0).getLong(0)
    assert(n == 8L)
  }
}
