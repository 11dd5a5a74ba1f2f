package graft.log

import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.file.{Files, Path, Paths}

/** Binary log-format parser against the reference repo's REAL standalone
  * log files (crates/core/tests/data/log_files — written by actual Hudi),
  * mirroring the assertions of the reference's reader tests
  * (file_group/log_file/reader.rs:324-503), plus a write→read round-trip
  * of our own writer.
  */
class LogFormatSpec extends AnyFunSuite {

  private val dir = Paths.get("/root/reference/crates/core/tests/data/log_files")

  private def logBytes(sub: String): Option[Array[Byte]] = {
    val d = dir.resolve(sub)
    if (!Files.exists(d)) return None
    Files.list(d).filter(p => p.getFileName.toString.contains(".log."))
      .findFirst().map[Option[Array[Byte]]](p => Some(Files.readAllBytes(p))).orElse(None)
  }

  test("reference avro data block parses") {
    assume(logBytes("valid_log_avro_data").isDefined)
    val blocks = LogFileParser.parse(logBytes("valid_log_avro_data").get, InstantRange.all)
    assert(blocks.size == 1)
    val b = blocks.head
    assert(b.blockType == LogFormat.AvroDataBlock)
    assert(b.instantTime == "20250316025828811")
    assert(b.dataRecords.size == 1)
    assert(b.dataSchema.isDefined)
  }

  test("reference parquet data block parses and decodes") {
    assume(logBytes("valid_log_parquet_data").isDefined)
    val blocks = LogFileParser.parse(logBytes("valid_log_parquet_data").get, InstantRange.all)
    assert(blocks.size == 1)
    val b = blocks.head
    assert(b.blockType == LogFormat.ParquetDataBlock)
    assert(b.instantTime == "20250113230424191")
    val (schema, rows) = ParquetBlock.decode(b.rawContent)
    assert(rows.size == 1)
    assert(schema.fieldNames.contains("_hoodie_record_key"))
  }

  test("reference delete block parses 3 delete records") {
    assume(logBytes("valid_log_delete").isDefined)
    val blocks = LogFileParser.parse(logBytes("valid_log_delete").get, InstantRange.all)
    assert(blocks.size == 1)
    val b = blocks.head
    assert(b.blockType == LogFormat.DeleteBlock)
    assert(b.instantTime == "20250618054714114")
    assert(b.deleteRecords.size == 3)
    assert(b.deleteRecords.forall(_._1 != null))
  }

  test("reference rollback command block parses") {
    assume(logBytes("valid_log_rollback").isDefined)
    val blocks = LogFileParser.parse(logBytes("valid_log_rollback").get, InstantRange.all)
    assert(blocks.size == 1)
    val b = blocks.head
    assert(b.blockType == LogFormat.CommandBlock && b.isRollback)
    assert(b.instantTime == "20250126040936578")
    assert(b.targetInstantTime.contains("20250126040826878"))
  }

  test("out-of-range data block is skipped, EOF clean") {
    assume(logBytes("valid_log_parquet_data").isDefined)
    val blocks = LogFileParser.parse(
      logBytes("valid_log_parquet_data").get, InstantRange.upTo("20200101000000000"))
    assert(blocks.isEmpty)
  }

  test("rollback removes earlier blocks of the target instant") {
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":["null","long"],"default":null}]}""".stripMargin)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put("id", 1L)
    LogFileWriter.avroDataBlock(out, "001", schema, Seq(rec))
    LogFileWriter.avroDataBlock(out, "002", schema, Seq(rec))
    LogFileWriter.rollbackBlock(out, "003", "002")
    val blocks = LogFileParser.parse(bos.toByteArray, InstantRange.all)
    assert(blocks.size == 3)
    val valid = LogFileParser.applyRollbacks(blocks)
    assert(valid.size == 1 && valid.head.instantTime == "001")
  }

  test("delete codec round-trips") {
    val deletes = Seq(("k1", "p", 5L), ("k2", "p", 0L), ("k3", "q", null))
    val bytes = DeleteRecordCodec.encode(deletes)
    val decoded = DeleteRecordCodec.decode(bytes)
    assert(decoded == deletes.toVector)
  }

  test("cdc data block decodes as record data (no silent loss)") {
    // scanner.rs:175-182 counts BlockType::CdcData among record blocks;
    // the content layout matches an avro data block
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"int"},{"name":"v","type":"string"}]}""".stripMargin)
    val recs = Seq((7, "before"), (8, "after")).map { case (i, s) =>
      val r = new org.apache.avro.generic.GenericData.Record(schema)
      r.put("id", i); r.put("v", s); r
    }
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    LogFileWriter.cdcDataBlock(out, "20240101000000000", schema, recs)
    out.close()
    val blocks = LogFileParser.parse(bos.toByteArray, InstantRange.all)
    assert(blocks.size == 1 && blocks.head.blockType == LogFormat.CdcDataBlock)
    assert(blocks.head.dataRecords.map(_.get("id")) == Vector(7, 8))
    val target = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val rows = RowAlign.blockRows(blocks.head, target).toVector
    assert(rows.map(r => (r.getInt(0), r.getString(1))) == Vector((7, "before"), (8, "after")))
  }

  test("corrupt blocks are skipped to the next magic (Hudi recovery semantics)") {
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":["null","long"],"default":null}]}""".stripMargin)
    def rec(id: Long) = {
      val r = new org.apache.avro.generic.GenericData.Record(schema)
      r.put("id", id); r
    }
    def block(ts: String, id: Long): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      LogFileWriter.avroDataBlock(out, ts, schema, Seq(rec(id)))
      bos.toByteArray
    }
    val b1 = block("001", 1L)
    val b2 = block("002", 2L)

    // (a) final block truncated mid-content (writer crash): earlier
    // blocks survive, the partial tail is dropped
    val truncated = b1 ++ b2.take(b2.length - 7)
    val pa = LogFileParser.parse(truncated, InstantRange.all)
    assert(pa.map(_.instantTime) == Vector("001"))

    // (b) garbage declared length in block 1: skip to block 2's magic
    val garbage = b1.clone()
    garbage(6) = 0x7f.toByte // blow up the 8-byte BE length
    val pb = LogFileParser.parse(garbage ++ b2, InstantRange.all)
    assert(pb.map(_.instantTime) == Vector("002"))

    // (c) corrupt region with NO later magic: everything after drops
    val pc = LogFileParser.parse(garbage, InstantRange.all)
    assert(pc.isEmpty)

    // (d) a mangled magic is still a structural error, not a skip
    val badMagic = b1.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalStateException] { LogFileParser.parse(badMagic, InstantRange.all) }

    // (e) intact files parse exactly as before
    assert(LogFileParser.parse(b1 ++ b2, InstantRange.all).map(_.instantTime)
      == Vector("001", "002"))

    // (f) writer crashed INSIDE the 8-byte length field: full magic,
    // <8 trailing bytes — corrupt tail, earlier blocks survive
    val midLength = b1 ++ b2.take(9) // 6-byte magic + 3 bytes of length
    val pf = LogFileParser.parse(midLength, InstantRange.all)
    assert(pf.map(_.instantTime) == Vector("001"))

    // (g) declared length near Long.MAX: pos+14+len must not overflow
    // negative and index with a bogus offset — skip to the next magic
    val huge = b1.clone()
    for (i <- 6 until 14) huge(i) = 0xff.toByte
    huge(6) = 0x7f.toByte // Long.MaxValue
    val pg = LogFileParser.parse(huge ++ b2, InstantRange.all)
    assert(pg.map(_.instantTime) == Vector("002"))
  }
}
