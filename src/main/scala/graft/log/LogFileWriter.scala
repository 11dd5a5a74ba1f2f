package graft.log

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory

import java.io.{ByteArrayOutputStream, DataOutputStream}

/** Writer for the Hudi log-block format — test/fixture support only (the
  * engine itself is read-only, like the reference; docs/reader-spec.md:345).
  * Produces V1-format files with V3 block content that [[LogFileParser]]
  * and real Hudi readers can both consume.
  */
object LogFileWriter {

  private def writeMetadata(out: DataOutputStream, md: Seq[(Int, String)]): Unit = {
    out.writeInt(md.size)
    for ((k, v) <- md) {
      out.writeInt(k)
      val bytes = v.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
    }
  }

  private def writeBlock(
      out: DataOutputStream,
      blockType: Int,
      header: Seq[(Int, String)],
      content: Array[Byte]
  ): Unit = {
    // assemble everything after the 8-byte blockLength field
    val body = new ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.writeInt(1) // log format version
    b.writeInt(blockType)
    writeMetadata(b, header)
    b.writeLong(content.length.toLong)
    b.write(content)
    writeMetadata(b, Nil) // footer
    val bodyLen = body.size()
    val totalLen = 6L + 8L + bodyLen + 8L
    b.writeLong(totalLen)
    b.flush()

    out.write(LogFormat.Magic)
    out.writeLong(body.size().toLong) // blockLength: bytes after this field
    body.writeTo(out)
  }

  /** Avro data block: instantTime + writer schema headers, V3 content. */
  def avroDataBlock(
      out: DataOutputStream,
      instantTime: String,
      schema: AvroSchema,
      records: Seq[GenericRecord]
  ): Unit =
    avroContentBlock(out, LogFormat.AvroDataBlock, instantTime, schema, records)

  /** CDC data block: identical content layout to an avro data block
    * (HoodieCDCDataBlock extends HoodieAvroDataBlock), block type 6.
    */
  def cdcDataBlock(
      out: DataOutputStream,
      instantTime: String,
      schema: AvroSchema,
      records: Seq[GenericRecord]
  ): Unit =
    avroContentBlock(out, LogFormat.CdcDataBlock, instantTime, schema, records)

  /** Shared V3 avro-content framing for data and CDC blocks. */
  private def avroContentBlock(
      out: DataOutputStream,
      blockType: Int,
      instantTime: String,
      schema: AvroSchema,
      records: Seq[GenericRecord]
  ): Unit = {
    val content = new ByteArrayOutputStream()
    val c = new DataOutputStream(content)
    c.writeInt(LogFormat.BlockVersionV3)
    c.writeInt(records.size)
    val writer = new GenericDatumWriter[GenericRecord](schema)
    for (r <- records) {
      val rec = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(rec, null)
      writer.write(r, enc)
      enc.flush()
      c.writeInt(rec.size())
      c.write(rec.toByteArray)
    }
    writeBlock(out, blockType,
      Seq(LogFormat.KeyInstantTime -> instantTime, LogFormat.KeySchema -> schema.toString), content.toByteArray)
  }

  /** Delete block: (recordKey, partitionPath, orderingVal) triples.
    * orderingVal must be null / Int / Long / Float / Double / String.
    */
  def deleteBlock(
      out: DataOutputStream,
      instantTime: String,
      schemaForHeader: AvroSchema,
      deletes: Seq[(String, String, Any)]
  ): Unit = {
    val datum = DeleteRecordCodec.encode(deletes)

    val content = new ByteArrayOutputStream()
    val c = new DataOutputStream(content)
    c.writeInt(LogFormat.BlockVersionV3)
    c.writeInt(datum.length)
    c.write(datum)

    writeBlock(out, LogFormat.DeleteBlock,
      Seq(LogFormat.KeyInstantTime -> instantTime, LogFormat.KeySchema -> schemaForHeader.toString),
      content.toByteArray)
  }

  /** Parquet data block: the content is a complete parquet file's bytes
    * (no version prefix — content.rs:135-146).
    */
  def parquetDataBlock(
      out: DataOutputStream,
      instantTime: String,
      schemaForHeader: AvroSchema,
      parquetBytes: Array[Byte]
  ): Unit =
    writeBlock(out, LogFormat.ParquetDataBlock,
      Seq(LogFormat.KeyInstantTime -> instantTime, LogFormat.KeySchema -> schemaForHeader.toString),
      parquetBytes)

  /** Metadata-table HFile data block: the content is a complete raw
    * HFile's bytes (no version prefix — content.rs:238-244), the shape
    * the MDT reader's log merge consumes.
    */
  def hfileDataBlock(
      out: DataOutputStream,
      instantTime: String,
      schemaForHeader: AvroSchema,
      hfileBytes: Array[Byte]
  ): Unit =
    writeBlock(out, LogFormat.HfileDataBlock,
      Seq(LogFormat.KeyInstantTime -> instantTime, LogFormat.KeySchema -> schemaForHeader.toString),
      hfileBytes)

  /** Rollback command block targeting `targetInstantTime`'s blocks. */
  def rollbackBlock(out: DataOutputStream, instantTime: String, targetInstantTime: String): Unit =
    writeBlock(out, LogFormat.CommandBlock,
      Seq(
        LogFormat.KeyInstantTime -> instantTime,
        LogFormat.KeyTargetInstantTime -> targetInstantTime,
        LogFormat.KeyCommandBlockType -> "0"),
      Array.emptyByteArray)
}
