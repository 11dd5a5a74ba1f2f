package graft.table

import graft.SparkTestBase

/** Systematic golden-fixture matrix over the reference's SampleTable enum
  * (crates/test/src/lib.rs:256-367), asserted against the same expected
  * row sets as table_read_tests.rs and v9_verification.rs. Scope: the
  * v6/v8 sample tables in every published format (cow + mor/parquet per
  * available_formats) and the six v9 txns tables in all three read modes
  * (cow, mor snapshot, mor read-optimized). The remaining enum members
  * live in [[V9MatrixSpec]] (timebasedkeygen date/epoch-millis/
  * unix-timestamp, full-table overwrite, v9 rollback — in exactly the
  * modes the reference asserts) and are out of scope for S7 (the four
  * lance tables). Together the two specs make a missing combination a
  * visible hole instead of a silent one.
  */
class SampleTableMatrixSpec extends SparkTestBase {

  private def open(fmt: String, name: String): Option[HudiTable] =
    Fixtures.table(s"sample_table/$fmt/$name.zip", name, s"matrix_${fmt.replace('/', '_')}_$name")
      .map(p => HudiTable(spark, p))

  private def idNameActive(df: org.apache.spark.sql.DataFrame): Set[(Int, String, Boolean)] =
    df.select("id", "name", "isActive").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getBoolean(2))).toSet

  // ---- sample_table (id, name, isActive) matrix --------------------------
  // Workload (sample_table/*/*.sql): c1 inserts {1 Alice true, 2 Bob false,
  // 3 Carol true}; c2 upserts id=1 (isActive→false) and inserts 4 Diana true.
  private val std4 = Set((1, "Alice", false), (2, "Bob", false), (3, "Carol", true), (4, "Diana", true))
  // rollback fixture: id=1's update rolled back, id=2 re-updated after
  // (table_read_tests.rs test_non_partitioned_rollback)
  private val rollback3 = Set((1, "Alice", true), (2, "Bob", true), (3, "Carol", true))
  // INSERT OVERWRITE TABLE leaves only the replacement row
  // (table_read_tests.rs incremental_queries, third commit)
  private val overwrite1 = Set((4, "Diana", false))
  private val empty0 = Set.empty[(Int, String, Boolean)]

  /** (format dir, table name, expected snapshot) — formats mirror
    * SampleTable::available_formats (lib.rs:334-367).
    */
  private val sampleMatrix: Seq[(String, String, Set[(Int, String, Boolean)])] = {
    val cowAndMorParquet = Seq(
      "v6_complexkeygen_hivestyle" -> std4,
      "v6_empty" -> empty0,
      "v6_nonpartitioned" -> std4,
      "v6_simplekeygen_hivestyle_no_metafields" -> std4,
      "v6_simplekeygen_nonhivestyle" -> std4,
      "v6_simplekeygen_nonhivestyle_overwritetable" -> overwrite1,
    )
    val cowOnly = Seq(
      "v6_timebasedkeygen_nonhivestyle" -> std4,
      "v8_complexkeygen_hivestyle" -> std4,
      "v8_empty" -> empty0,
      "v8_nonpartitioned" -> std4,
      "v8_simplekeygen_hivestyle_no_metafields" -> std4,
      "v8_simplekeygen_nonhivestyle" -> std4,
    )
    val morParquetOnly = Seq(
      "v6_nonpartitioned_rollback" -> rollback3,
    )
    cowAndMorParquet.flatMap { case (n, e) => Seq(("cow", n, e), ("mor/parquet", n, e)) } ++
      cowOnly.map { case (n, e) => ("cow", n, e) } ++
      morParquetOnly.map { case (n, e) => ("mor/parquet", n, e) }
  }

  for ((fmt, name, expected) <- sampleMatrix)
    test(s"matrix $fmt/$name snapshot matches the reference's golden rows") {
      val t = open(fmt, name)
      assume(t.isDefined, s"fixture $fmt/$name.zip unavailable")
      val df = t.get.snapshot()
      if (expected.isEmpty) assert(df.count() == 0)
      else assert(idNameActive(df) == expected)
    }

  // ---- v9 txns matrix -----------------------------------------------------
  // The reference's v9 txns fixtures exercise INSERT OVERWRITE PARTITION,
  // MOR compaction, clustering (replacecommit), record-index/secondary-index
  // metadata partitions, and no-metafields writes; expected surviving rows
  // from crates/test/src/v9_verification.rs:32-146.
  private val partitionedTxnIds = Seq(
    "TXN-001", "TXN-003", "TXN-007", "TXN-008", "TXN-011", "TXN-012",
    "TXN-013", "TXN-014", "TXN-015", "TXN-016", "TXN-017", "TXN-018")
  private val nonpartTxnIds = Seq(
    "TXN-001", "TXN-003", "TXN-004", "TXN-006", "TXN-007", "TXN-008",
    "TXN-009", "TXN-010", "TXN-011", "TXN-012", "TXN-013", "TXN-014",
    "TXN-015", "TXN-016")

  /** (table name, partitioned) — all six are COW_AND_MOR_AVRO. */
  private val txnsMatrix = Seq(
    ("v9_txns_simple_meta", true),
    ("v9_txns_simple_nometa", true),
    ("v9_txns_complex_meta", true),
    ("v9_txns_complex_nometa", true),
    ("v9_txns_nonpart_meta", false),
    ("v9_txns_nonpart_nometa", false),
  )

  private def txnIds(df: org.apache.spark.sql.DataFrame, where: String = "true"): Seq[String] =
    df.where(where).select("txn_id").collect().map(_.getString(0)).sorted.toSeq

  private def verifyTxns(df: org.apache.spark.sql.DataFrame, partitioned: Boolean): Unit = {
    assert(txnIds(df) == (if (partitioned) partitionedTxnIds else nonpartTxnIds))
    // TXN-001's update landed (MOR: via log merge pre-compaction)
    assert(df.where("txn_id = 'TXN-001'").select("txn_type")
      .collect().map(_.getString(0)).toSeq == Seq("reversal"))
    // TXN-007's fee update landed
    assert(df.where("txn_id = 'TXN-007' AND fee_amount = 75.00").count() == 1)
    if (partitioned) {
      // INSERT OVERWRITE PARTITION (region='eu') replaced 004/006/009/010
      assert(txnIds(df, "region = 'eu'") == Seq("TXN-011", "TXN-012", "TXN-018"))
      assert(txnIds(df, "region = 'us'") ==
        Seq("TXN-001", "TXN-003", "TXN-013", "TXN-014", "TXN-017"))
      assert(txnIds(df, "region = 'apac'") ==
        Seq("TXN-007", "TXN-008", "TXN-015", "TXN-016"))
    } else {
      assert(df.where("txn_id IN ('TXN-001', 'TXN-008', 'TXN-015')")
        .select("txn_id", "merchant_name").collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq ==
        Seq(("TXN-001", "Amazon"), ("TXN-008", "Grab"), ("TXN-015", "Japan Airlines")))
    }
  }

  for ((name, partitioned) <- txnsMatrix) {
    test(s"matrix cow/$name snapshot survives overwrite+clustering history") {
      val t = open("cow", name)
      assume(t.isDefined, s"fixture cow/$name.zip unavailable")
      verifyTxns(t.get.snapshot(), partitioned)
    }
    test(s"matrix mor/avro/$name snapshot merges logs over compacted bases") {
      val t = open("mor/avro", name)
      assume(t.isDefined, s"fixture mor/avro/$name.zip unavailable")
      verifyTxns(t.get.snapshot(), partitioned)
    }
    test(s"matrix mor/avro/$name read-optimized matches snapshot post-compaction") {
      // compaction + clustering materialized all updates/deletes into base
      // files and the post-clustering inserts are base-file records, so RO
      // and snapshot agree on these fixtures (v9_verification.rs:185-190)
      val t = open("mor/avro", name)
      assume(t.isDefined, s"fixture mor/avro/$name.zip unavailable")
      verifyTxns(t.get.snapshot(readOptimized = true), partitioned)
    }
  }
}
