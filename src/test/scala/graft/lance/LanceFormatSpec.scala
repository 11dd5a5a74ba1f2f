package graft.lance

import graft.SparkTestBase
import graft.table.Fixtures
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

/** Byte-level checks of the Lance v2 reader against the reference's
  * golden fixtures (crates/test/data/... v9 Lance tables) — values
  * asserted from the sibling .sql scripts.
  */
class LanceFormatSpec extends SparkTestBase {

  private val conf = new Configuration()

  /** The nonpartitioned sample table's INSERT-commit file (commit
    * 20260503194246834 per the .sql — the earliest of the table).
    */
  private def insertFile: Option[String] =
    Fixtures.table("sample_table/cow/v9_lance_nonpartitioned.zip", "v9_lance_nonpartitioned")
      .flatMap { dir =>
        val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
          .filter(_.endsWith(".lance")).sorted
        files.find(_.contains("20260503194246834"))
      }

  test("schema parses names, types, and the nested list element") {
    assume(insertFile.isDefined)
    val st = LanceFormat.readSchema(insertFile.get, conf)
    assert(st.fieldNames.toSeq == Seq(
      "_hoodie_commit_time", "_hoodie_commit_seqno", "_hoodie_record_key",
      "_hoodie_partition_path", "_hoodie_file_name",
      "id", "name", "category", "score", "tags", "updated_at"))
    assert(st("id").dataType == IntegerType)
    assert(st("score").dataType == DoubleType)
    assert(st("tags").dataType == ArrayType(StringType, containsNull = false))
    assert(st("updated_at").dataType == LongType)
  }

  test("metadata row count needs no data IO") {
    assume(insertFile.isDefined)
    assert(LanceFormat.rowCount(insertFile.get, conf) == 8L)
  }

  test("projected rows decode the insert commit exactly") {
    assume(insertFile.isDefined)
    val req = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("category", StringType), StructField("score", DoubleType),
      StructField("tags", ArrayType(StringType, containsNull = false)),
      StructField("updated_at", LongType)))
    val rows = LanceFormat.rows(insertFile.get, conf, req).toArray
    assert(rows.length == 8)
    val first = rows.head
    assert(first.getInt(0) == 1)
    assert(first.getUTF8String(1).toString == "feature-set-alpha")
    assert(first.getUTF8String(2).toString == "vision")
    assert(first.getDouble(3) == 0.92)
    assert(first.getArray(4).toArray[org.apache.spark.unsafe.types.UTF8String](StringType)
      .map(_.toString).toSeq == Seq("cnn", "resnet", "imagenet"))
    assert(first.getLong(5) == 1700000000000L)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 8))
    // per-row list boundaries hold across the whole element column
    assert(rows(7).getArray(4).toArray[org.apache.spark.unsafe.types.UTF8String](StringType)
      .map(_.toString).toSeq == Seq("whisper", "transcription"))
  }

  test("absent fields null-fill; type mismatch fails closed") {
    assume(insertFile.isDefined)
    val req = StructType(Seq(
      StructField("id", IntegerType), StructField("not_in_file", StringType)))
    val rows = LanceFormat.rows(insertFile.get, conf, req).toArray
    assert(rows.forall(_.isNullAt(1)))
    val bad = StructType(Seq(StructField("id", LongType)))
    val e = intercept[UnsupportedOperationException] {
      LanceFormat.rows(insertFile.get, conf, bad).toArray
    }
    assert(e.getMessage.contains("table schema wants"))
  }

  test("decimal128, date32, bool, and timestamp decode (txns fixture)") {
    val dir = Fixtures.table("sample_table/cow/v9_lance_txns_simple.zip", "v9_lance_txns_simple")
    assume(dir.isDefined)
    val apac = Files.list(Paths.get(dir.get, "region=apac")).toArray.map(_.toString)
      .filter(_.endsWith(".lance")).sorted
    assume(apac.nonEmpty)
    // TXN-015/TXN-016 insert file (commit 20260505182346727 in the .sql)
    val f = apac.find(_.contains("20260505182346727"))
    assume(f.isDefined)
    val req = StructType(Seq(
      StructField("txn_id", StringType),
      StructField("txn_datetime", TimestampType),
      StructField("txn_date", DateType),
      StructField("amount", DecimalType(15, 2)),
      StructField("is_international", BooleanType),
      StructField("fee_amount", DecimalType(10, 2))))
    val rows = LanceFormat.rows(f.get, conf, req).toArray
    assert(rows.map(_.getUTF8String(0).toString).toSeq == Seq("TXN-015", "TXN-016"))
    // TIMESTAMP '2024-01-20 10:00:00' (written UTC) in micros
    assert(rows(0).getLong(1) == 1705744800000000L)
    // DATE '2024-01-20' = 19742 days since epoch
    assert(rows(0).getInt(2) == 19742)
    assert(rows(0).getDecimal(3, 15, 2).toJavaBigDecimal ==
      new java.math.BigDecimal("4500.00"))
    assert(rows(0).getBoolean(4))
    assert(!rows(1).getBoolean(4))
    assert(rows(1).getDecimal(5, 10, 2).toJavaBigDecimal ==
      new java.math.BigDecimal("0.00"))
  }

  test("non-lance bytes fail with a clear magic error") {
    val tmp = Files.createTempFile("notlance", ".lance")
    Files.write(tmp, Array.fill[Byte](64)(7))
    val e = intercept[UnsupportedOperationException] {
      LanceFormat.readMetadata(tmp.toString, conf)
    }
    assert(e.getMessage.contains("magic"))
  }
}
