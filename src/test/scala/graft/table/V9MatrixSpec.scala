package graft.table

import graft.SparkTestBase

/** v9 (table version 9, timeline layout 2) parity against the reference's
  * golden matrix — the txn-schema SampleTable variants
  * (crates/test/src/lib.rs:270-279), with row expectations mirrored from
  * crates/core/tests/table_read_tests.rs (snapshot_queries for v9) and the
  * reference's own MDT-vs-listing differential
  * (test_mdt_read_matches_nometa_read).
  */
class V9MatrixSpec extends SparkTestBase {

  private type Txn = (String, String, Long)

  private def snap(zipRel: String, name: String, dest: String,
      readOptimized: Boolean = false): Option[Vector[Txn]] =
    Fixtures.table(zipRel, name, dest).map { p =>
      HudiTable(spark, p).snapshot(readOptimized = readOptimized)
        .select("txn_id", "txn_type", "txn_ts")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toVector
    }

  test("v9 cow timebasedkeygen (date-string) snapshot") {
    val rows = snap("sample_table/cow/v9_timebasedkeygen_nonhivestyle.zip",
      "v9_timebasedkeygen_nonhivestyle", "v9_tbk_cow")
    assume(rows.isDefined)
    assert(rows.get == Vector(
      ("TXN-001", "debit", 1700000000001L),
      ("TXN-001", "reversal", 1700100000001L),
      ("TXN-003", "debit", 1700200000003L),
      ("TXN-004", "transfer", 1700000000004L),
      ("TXN-005", "debit", 1700100000005L)))
  }

  test("v9 cow timebasedkeygen (epoch-millis) snapshot") {
    val rows = snap("sample_table/cow/v9_timebasedkeygen_epochmillis.zip",
      "v9_timebasedkeygen_epochmillis", "v9_tbk_epoch_cow")
    assume(rows.isDefined)
    assert(rows.get == Vector(
      ("TXN-001", "debit", 1700000000001L),
      ("TXN-001", "reversal", 1700100000001L),
      ("TXN-002", "debit", 1700000000002L),
      ("TXN-003", "debit", 1700200000003L),
      ("TXN-005", "debit", 1700100000005L),
      ("TXN-006", "transfer", 1700100000006L)))
  }

  test("v9 cow timebasedkeygen (unix-timestamp) snapshot") {
    val rows = snap("sample_table/cow/v9_timebasedkeygen_unixtimestamp.zip",
      "v9_timebasedkeygen_unixtimestamp", "v9_tbk_unix_cow")
    assume(rows.isDefined)
    assert(rows.get == Vector(
      ("TXN-001", "debit", 1700000000001L),
      ("TXN-001", "reversal", 1700100000001L),
      ("TXN-002", "debit", 1700000000002L),
      ("TXN-003", "debit", 1700200000003L),
      ("TXN-005", "debit", 1700100000005L),
      ("TXN-006", "transfer", 1700100000006L)))
  }

  test("v9 cow full-table overwrite (replacecommit) snapshot") {
    val rows = snap("sample_table/cow/v9_txns_simple_overwrite.zip",
      "v9_txns_simple_overwrite", "v9_overwrite_cow")
    assume(rows.isDefined)
    assert(rows.get == Vector(
      ("TXN-101", "debit", 1700500000001L),
      ("TXN-102", "debit", 1700500000002L),
      ("TXN-103", "debit", 1700500000003L)))
  }

  test("v9 mor full-table overwrite read-optimized snapshot") {
    val rows = snap("sample_table/mor/avro/v9_txns_simple_overwrite.zip",
      "v9_txns_simple_overwrite", "v9_overwrite_mor", readOptimized = true)
    assume(rows.isDefined)
    assert(rows.get == Vector(
      ("TXN-101", "debit", 1700500000001L),
      ("TXN-102", "debit", 1700500000002L),
      ("TXN-103", "debit", 1700500000003L)))
  }

  test("v9 mor timebasedkeygen read-optimized snapshot") {
    val rows = snap("sample_table/mor/avro/v9_timebasedkeygen_nonhivestyle.zip",
      "v9_timebasedkeygen_nonhivestyle", "v9_tbk_mor", readOptimized = true)
    assume(rows.isDefined)
    assert(rows.get == Vector(
      ("TXN-001", "debit", 1700000000001L),
      ("TXN-001", "reversal", 1700100000001L),
      ("TXN-002", "debit", 1700000000002L),
      ("TXN-003", "debit", 1700000000003L),
      ("TXN-004", "transfer", 1700000000004L),
      ("TXN-005", "debit", 1700100000005L),
      ("TXN-006", "debit", 1700300000006L)))
  }

  test("v9 mor rollback snapshot (rolled-back instant excluded)") {
    val rows = snap("sample_table/mor/avro/v9_nonpartitioned_rollback.zip",
      "v9_nonpartitioned_rollback", "v9_rollback_mor")
    assume(rows.isDefined)
    assert(rows.get == Vector(
      ("TXN-001", "debit", 1700000000001L),
      ("TXN-002", "debit", 1700000000002L),
      ("TXN-002", "debit", 1700200000002L),
      ("TXN-003", "debit", 1700000000003L)))
  }

  /** The reference's MDT differential: the metadata-table-backed listing
    * must produce exactly the rows the plain storage listing produces,
    * across simple / nonpartitioned / complex keygen MOR variants.
    */
  for ((meta, nometa, tag) <- Seq(
      ("v9_txns_simple_meta", "v9_txns_simple_nometa", "simple"),
      ("v9_txns_nonpart_meta", "v9_txns_nonpart_nometa", "nonpart"),
      ("v9_txns_complex_meta", "v9_txns_complex_nometa", "complex"))) {
    test(s"v9 mor MDT listing matches storage listing ($tag)") {
      val m = snap(s"sample_table/mor/avro/$meta.zip", meta, s"v9_${tag}_meta_mor")
      val n = snap(s"sample_table/mor/avro/$nometa.zip", nometa, s"v9_${tag}_nometa_mor")
      assume(m.isDefined && n.isDefined)
      assert(m.get.nonEmpty, "differential is vacuous on an empty table")
      assert(m.get == n.get, s"MDT-backed read diverges from storage listing for $tag")
    }
  }
}
