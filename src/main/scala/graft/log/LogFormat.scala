package graft.log

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory

import java.io.{ByteArrayInputStream, DataInputStream, EOFException}
import scala.collection.mutable

/** The Hudi `.log` delta-file binary format (reference:
  * crates/core/src/file_group/log_file/{log_format,log_block,reader}.rs).
  *
  * File = repeated blocks, each:
  * {{{
  *   MAGIC "#HUDI#" (6B)
  *   blockLength (8B BE)        // bytes from after this field to block end
  *   formatVersion (4B BE)      // 1 for modern tables
  *   blockType (4B BE)          // 0 cmd, 1 delete, 3 avro, 5 parquet, ...
  *   header:  count(4B) then per entry key(4B), valueLen(4B), valueBytes
  *   contentLength (8B BE)
  *   content (contentLength B)
  *   footer:  same shape as header
  *   totalBlockLength (8B BE)
  * }}}
  *
  * Avro data-block content (V3): version(4B)=3, recordCount(4B), then per
  * record recordLen(4B) + Avro binary datum of the header's Schema.
  * Delete-block content: version(4B)=3, datumLen(4B), one
  * `HoodieDeleteRecordList` datum.
  */
object LogFormat {
  val Magic: Array[Byte] = "#HUDI#".getBytes("UTF-8")

  // Block types (log_block.rs:74-82)
  val CommandBlock = 0
  val DeleteBlock = 1
  val CorruptedBlock = 2
  val AvroDataBlock = 3
  val HfileDataBlock = 4
  val ParquetDataBlock = 5
  val CdcDataBlock = 6

  // Header metadata keys (log_block.rs:146-161)
  val KeyInstantTime = 0
  val KeyTargetInstantTime = 1
  val KeySchema = 2
  val KeyCommandBlockType = 3

  /** Block content serialization version used by modern tables. */
  val BlockVersionV3 = 3

}

/** Hand-rolled binary codec for `HoodieDeleteRecordList` (the schema
  * constant at crates/core/schemas/HoodieDeleteRecordList.avsc). Java Avro
  * refuses the spec's orderingVal union (its logical-type branches repeat
  * the raw types `int`/`long`/`bytes`, which Schema.Parser treats as
  * duplicates), so the datum is decoded/encoded directly against the
  * branch table — whose ORDER is a fixed part of the log format:
  *
  * 0 null, 1 int, 2 long, 3 float, 4 double, 5 bytes, 6 string,
  * 7 decimal(bytes,30,15), 8 date(int), 9 time-millis(int),
  * 10 time-micros(long), 11 ts-millis(long), 12 ts-micros(long)
  */
object DeleteRecordCodec {
  import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}

  def decode(datum: Array[Byte]): Vector[(String, String, Any)] = {
    val dec = DecoderFactory.get().binaryDecoder(datum, null)
    val out = Vector.newBuilder[(String, String, Any)]
    var n = dec.readArrayStart()
    while (n > 0) {
      var i = 0L
      while (i < n) {
        val key = readNullableString(dec)
        val part = readNullableString(dec)
        val ord = readOrderingVal(dec)
        out += ((key, Option(part).getOrElse(""), ord))
        i += 1
      }
      n = dec.arrayNext()
    }
    out.result()
  }

  private def readNullableString(dec: BinaryDecoder): String =
    if (dec.readIndex() == 0) { dec.readNull(); null }
    else dec.readString()

  private def readOrderingVal(dec: BinaryDecoder): Any = dec.readIndex() match {
    case 0 => dec.readNull(); null
    case 1 | 8 | 9 => dec.readInt()
    case 2 | 10 | 11 | 12 => dec.readLong()
    case 3 => dec.readFloat()
    case 4 => dec.readDouble()
    case 5 =>
      val bb = dec.readBytes(null)
      val b = new Array[Byte](bb.remaining()); bb.get(b); b
    case 6 => dec.readString()
    case 7 =>
      val bb = dec.readBytes(null)
      val b = new Array[Byte](bb.remaining()); bb.get(b)
      new java.math.BigDecimal(new java.math.BigInteger(b), 15)
    case other => throw new IllegalStateException(s"Invalid orderingVal union branch $other")
  }

  /** Encode triples; orderingVal supports null/Int/Long/Float/Double/String. */
  def encode(deletes: Seq[(String, String, Any)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val enc: BinaryEncoder = EncoderFactory.get().binaryEncoder(bos, null)
    enc.writeArrayStart()
    enc.setItemCount(deletes.size)
    for ((key, part, ord) <- deletes) {
      enc.startItem()
      writeNullableString(enc, key)
      writeNullableString(enc, part)
      ord match {
        case null => enc.writeIndex(0); enc.writeNull()
        case i: Int => enc.writeIndex(1); enc.writeInt(i)
        case l: Long => enc.writeIndex(2); enc.writeLong(l)
        case f: Float => enc.writeIndex(3); enc.writeFloat(f)
        case d: Double => enc.writeIndex(4); enc.writeDouble(d)
        case s: String => enc.writeIndex(6); enc.writeString(s)
        case other => throw new IllegalArgumentException(s"Unsupported orderingVal: ${other.getClass}")
      }
    }
    enc.writeArrayEnd()
    enc.flush()
    bos.toByteArray
  }

  private def writeNullableString(enc: BinaryEncoder, s: String): Unit =
    if (s == null) { enc.writeIndex(0); enc.writeNull() }
    else { enc.writeIndex(1); enc.writeString(s) }
}

/** Half-open instant range `(startExclusive, endInclusive]` used to bound
  * log-block visibility (reference: timeline/selector.rs InstantRange).
  */
final case class InstantRange(startExclusive: Option[String], endInclusive: Option[String]) {
  def contains(ts: String): Boolean =
    startExclusive.forall(ts > _) && endInclusive.forall(ts <= _)
}

object InstantRange {
  val all: InstantRange = InstantRange(None, None)
  def upTo(end: String): InstantRange = InstantRange(None, Some(end))
}

/** One parsed block: decoded content plus the headers that drive merging. */
final case class LogBlock(
    blockType: Int,
    header: Map[Int, String],
    /** Decoded data records with their writer schema (Avro data blocks). */
    dataRecords: Vector[GenericRecord],
    dataSchema: Option[AvroSchema],
    /** (recordKey, partitionPath, orderingVal) from delete blocks. */
    deleteRecords: Vector[(String, String, Any)],
    /** Raw content for block types decoded elsewhere (parquet). */
    rawContent: Array[Byte]
) {
  def instantTime: String = header.getOrElse(LogFormat.KeyInstantTime, "")
  def targetInstantTime: Option[String] = header.get(LogFormat.KeyTargetInstantTime)
  def isRollback: Boolean =
    blockType == LogFormat.CommandBlock && header.get(LogFormat.KeyCommandBlockType).contains("0")
}

/** Streaming parser for one log file's bytes. Executors read whole files —
  * log files are bounded by the writer's roll size, and the format has no
  * index to seek by, exactly like the reference's reader.
  */
object LogFileParser {

  def parse(bytes: Array[Byte], range: InstantRange): Vector[LogBlock] = {
    val blocks = Vector.newBuilder[LogBlock]
    var pos = 0
    while (pos + 6 <= bytes.length) {
      // partial magic at EOF = clean end; a full-width mismatch is a
      // structural error (the same contract as the reference,
      // reader.rs:85 — its corrupt-block creation is a TODO)
      if (!magicAt(bytes, pos))
        throw new IllegalStateException(s"Invalid log block magic at offset $pos")
      // Writer crashed INSIDE the 8-byte length field (full magic, <8
      // trailing bytes): corrupt tail, not a readable block — stop before
      // beLong walks off the array.
      if (pos + 14 > bytes.length) { pos = bytes.length }
      else {
      val blockLength = beLong(bytes, pos + 6)
      // Long-safe: a garbage length near Long.MAX must not overflow
      // expectedEnd negative (which would pass `<= bytes.length` and then
      // index with a negative offset).
      val expectedEnd =
        if (blockLength < 0 || blockLength > bytes.length - pos - 14) Long.MaxValue
        else pos + 6 + 8 + blockLength
      // Hudi's corrupt-block detection (HoodieLogFileReader
      // isBlockCorrupted, beyond the reference's TODO): the declared
      // length must land exactly on EOF or on the next block's magic.
      // A partially-written block (writer crash before rollback) or a
      // garbage length otherwise poisons every later offset — instead,
      // SKIP to the next magic and keep reading; the lost block's
      // commit was never completed, so dropping it is the correct
      // visibility outcome, not data loss.
      val valid = blockLength > 0 && expectedEnd <= bytes.length &&
        (expectedEnd == bytes.length || magicAt(bytes, expectedEnd.toInt))
      if (!valid) {
        val next = nextMagic(bytes, pos + 6)
        pos = if (next < 0) bytes.length else next
      } else {
        val in = new DataInputStream(new ByteArrayInputStream(
          bytes, pos + 14, blockLength.toInt))
        val formatVersion = in.readInt()
        if (formatVersion != 1)
          throw new IllegalStateException(s"Unsupported log format version $formatVersion")
        val blockType = in.readInt()
        val header = readMetadata(in)
        val contentLength = in.readLong()
        val inRange = header.get(LogFormat.KeyInstantTime).forall(range.contains)
        if (!inRange || blockType == LogFormat.CorruptedBlock) {
          // rollback/command blocks are never skipped by range in the
          // reference scanner either — they carry no instant-scoped data
          if (!inRange && blockType == LogFormat.CommandBlock)
            blocks += LogBlock(blockType, header, Vector.empty, None, Vector.empty, Array.empty)
        } else {
          val content = readSized(in, contentLength, "content")
          blocks += decode(blockType, header, content)
        }
        pos = expectedEnd.toInt
      }
      }
    }
    blocks.result()
  }

  private def magicAt(bytes: Array[Byte], at: Int): Boolean =
    at + 6 <= bytes.length &&
      java.util.Arrays.equals(bytes, at, at + 6, LogFormat.Magic, 0, 6)

  /** First magic position at or after `from`; -1 if none. */
  private def nextMagic(bytes: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i + 6 <= bytes.length) {
      if (bytes(i) == LogFormat.Magic(0) && magicAt(bytes, i)) return i
      i += 1
    }
    -1
  }

  private def beLong(bytes: Array[Byte], at: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(at + i) & 0xffL); i += 1 }
    v
  }


  /** Bounded read: every interior length is validated against the
    * stream's remaining bytes BEFORE allocation — a corrupt length
    * inside a valid block envelope must fail closed, not attempt a
    * multi-GB allocation (the envelope walk already bounds blockLength;
    * this closes the same hazard one level down).
    */
  private def readSized(in: DataInputStream, len: Long, what: String): Array[Byte] = {
    require(len >= 0 && len <= in.available(),
      s"log block: $what length $len exceeds remaining ${in.available()} bytes")
    val buf = new Array[Byte](len.toInt)
    in.readFully(buf)
    buf
  }

  private def readMetadata(in: DataInputStream): Map[Int, String] = {
    val n = in.readInt()
    val m = Map.newBuilder[Int, String]
    for (_ <- 0 until n) {
      val key = in.readInt()
      val buf = readSized(in, in.readInt(), s"metadata entry $key")
      m += key -> new String(buf, "UTF-8")
    }
    m.result()
  }

  private def decode(blockType: Int, header: Map[Int, String], content: Array[Byte]): LogBlock =
    blockType match {
      // CDC data blocks share the avro data-block content layout
      // (HoodieCDCDataBlock extends HoodieAvroDataBlock) and count as
      // record blocks in the reference scanner (scanner.rs:175-182)
      case LogFormat.AvroDataBlock | LogFormat.CdcDataBlock =>
        val schemaJson = header.getOrElse(LogFormat.KeySchema,
          throw new IllegalStateException("Avro data block without Schema header"))
        val schema = new AvroSchema.Parser().parse(schemaJson)
        val in = new DataInputStream(new ByteArrayInputStream(content))
        val contentVersion = in.readInt()
        require(contentVersion == LogFormat.BlockVersionV3, s"log block content version $contentVersion")
        val count = in.readInt()
        val reader = new GenericDatumReader[GenericRecord](schema)
        val records = Vector.newBuilder[GenericRecord]
        for (i <- 0 until count) {
          val buf = readSized(in, in.readInt(), s"avro record $i")
          val dec = DecoderFactory.get().binaryDecoder(buf, null)
          records += reader.read(null, dec)
        }
        LogBlock(blockType, header, records.result(), Some(schema), Vector.empty, Array.empty)

      case LogFormat.DeleteBlock =>
        val in = new DataInputStream(new ByteArrayInputStream(content))
        val contentVersion = in.readInt()
        require(contentVersion == LogFormat.BlockVersionV3, s"log block content version $contentVersion")
        val buf = readSized(in, in.readInt(), "delete records")
        LogBlock(blockType, header, Vector.empty, None, DeleteRecordCodec.decode(buf), Array.empty)

      case LogFormat.ParquetDataBlock =>
        LogBlock(blockType, header, Vector.empty, None, Vector.empty, content)

      // metadata-table log blocks: content is a raw HFile (no 4-byte
      // version prefix — content.rs:238-244); decoded by the MDT reader
      case LogFormat.HfileDataBlock =>
        LogBlock(blockType, header, Vector.empty, None, Vector.empty, content)

      case _ => // command and anything else: headers only
        LogBlock(blockType, header, Vector.empty, None, Vector.empty, Array.empty)
    }

  /** Union-decoded Avro scalars → plain JVM values. */
  def normalizeAvroScalar(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case bb: java.nio.ByteBuffer => val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
    case f: org.apache.avro.generic.GenericFixed => f.bytes()
    case other => other
  }

  /** Rollback application (scanner.rs:106-124): drop previously collected
    * blocks whose instant time equals a rollback block's target.
    */
  def applyRollbacks(blocks: Vector[LogBlock]): Vector[LogBlock] = {
    val kept = mutable.ArrayBuffer.empty[LogBlock]
    for (b <- blocks) {
      if (b.isRollback) {
        val target = b.targetInstantTime
        target.foreach(t => kept.filterInPlace(_.instantTime != t))
      } else kept += b
    }
    kept.toVector
  }
}
