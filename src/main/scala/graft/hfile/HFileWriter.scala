package graft.hfile

import java.io.ByteArrayOutputStream

/** Minimal HBase-style HFile v3 writer — just enough of the format to
  * produce files [[HFileReader]] (and the reference reader, hfile
  * format spec hudi-io/hfile_format.md) accepts: NONE compression,
  * NULL checksums, a single-level root data index, an empty meta
  * index, and a protobuf file-info/trailer. Used to build
  * metadata-table fixtures whose `files` partition is then read back
  * through the full S8/S11/M7 path.
  *
  * Layout written: [data blocks][root data index][meta root index]
  * [file info][4096-byte trailer].
  */
object HFileWriter {
  import HFileFormat._

  /** Hadoop WritableUtils vlong (inverse of [[HFileFormat.readVLong]]). */
  private def writeVLong(out: ByteArrayOutputStream, i: Long): Unit = {
    if (i >= -112 && i <= 127) { out.write(i.toInt & 0xff); return }
    var len = -112
    var value = i
    if (i < 0) { value = ~i; len = -120 }
    var tmp = value
    while (tmp != 0) { tmp >>>= 8; len -= 1 }
    out.write(len & 0xff)
    val numBytes = if (len < -120) -(len + 120) else -(len + 112)
    var idx = numBytes - 1
    while (idx >= 0) { out.write(((value >> (8 * idx)) & 0xff).toInt); idx -= 1 }
  }

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def beInt(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def beLong(out: ByteArrayOutputStream, v: Long): Unit = {
    beInt(out, (v >>> 32).toInt); beInt(out, v.toInt)
  }

  private def beShort(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  /** One on-disk block: 33-byte header + uncompressed payload, checksum
    * type NULL (bytesPerChecksum = 0 → no checksum chunks, matching the
    * reader's `bytesPerChecksum <= 0` branch).
    */
  private def block(magic: Array[Byte], payload: Array[Byte], prevOffset: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(magic, 0, MagicLength)
    beInt(out, payload.length) // onDiskSizeWithoutHeader
    beInt(out, payload.length) // uncompressedSizeWithoutHeader
    beLong(out, prevOffset)
    out.write(0) // checksum type NULL
    beInt(out, 0) // bytesPerChecksum
    beInt(out, BlockHeaderSize + payload.length) // onDiskDataSizeWithHeader
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** The structured cell key: contentLen(2) + content + famLen(1)=0 +
    * timestamp(8)=LATEST + type(1)=Put (key.rs:158-265; the reader only
    * consumes the 2-byte-prefixed content).
    */
  private def cellKey(content: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    beShort(out, content.length)
    out.write(content, 0, content.length)
    out.write(0) // family length
    beLong(out, Long.MaxValue) // HBase LATEST_TIMESTAMP
    out.write(4) // KeyValue type Put
    out.toByteArray
  }

  /** Serialize `records` (MUST be pre-sorted by key bytes) into a complete
    * HFile v3 byte array. `fileInfo` lands in the info block (e.g. the
    * `schema` avro-json the metadata table requires).
    */
  def write(
      records: Seq[(String, Array[Byte])],
      fileInfo: Map[String, Array[Byte]],
      recordsPerBlock: Int = 64): Array[Byte] = {
    val keys = records.map(_._1.getBytes("UTF-8"))
    require(keys.lazyZip(keys.drop(1)).forall((a, b) => java.util.Arrays.compare(a, b) < 0),
      "HFile records must be strictly sorted by key bytes")
    require(records.nonEmpty, "HFile must contain at least one record")

    val file = new ByteArrayOutputStream()

    // --- data blocks ------------------------------------------------------
    val groups = records.grouped(recordsPerBlock).toVector
    var prevOffset = -1L
    val index = Vector.newBuilder[(Array[Byte], Long, Int)] // (firstKey, offset, sizeWithHeader)
    for (group <- groups) {
      val payload = new ByteArrayOutputStream()
      for ((k, v) <- group) {
        val key = cellKey(k.getBytes("UTF-8"))
        beInt(payload, key.length)
        beInt(payload, v.length)
        payload.write(key, 0, key.length)
        payload.write(v, 0, v.length)
        payload.write(0) // MVCC version (always 0 for Hudi)
      }
      val offset = file.size().toLong
      val b = block(DataMagic, payload.toByteArray, prevOffset)
      file.write(b, 0, b.length)
      index += ((group.head._1.getBytes("UTF-8"), offset, b.length))
      prevOffset = offset
    }
    val firstDataOffset = 0L
    val lastDataOffset = index.result().last._2

    // --- root data index (single level) -----------------------------------
    val loadOnOpenOffset = file.size().toLong
    val rootPayload = new ByteArrayOutputStream()
    for ((firstKey, offset, size) <- index.result()) {
      beLong(rootPayload, offset)
      beInt(rootPayload, size)
      // structured key: 2-byte content length prefix (parseRootEntries
      // contentKeyOnly=false path)
      val structured = new ByteArrayOutputStream()
      beShort(structured, firstKey.length)
      structured.write(firstKey, 0, firstKey.length)
      val sk = structured.toByteArray
      writeVLong(rootPayload, sk.length.toLong)
      rootPayload.write(sk, 0, sk.length)
    }
    val rootBlock = block(RootIndexMagic, rootPayload.toByteArray, prevOffset)
    file.write(rootBlock, 0, rootBlock.length)

    // --- meta root index (always present, zero entries) -------------------
    val metaBlock = block(RootIndexMagic, Array.emptyByteArray, loadOnOpenOffset)
    file.write(metaBlock, 0, metaBlock.length)

    // --- file info: PBUF + InfoProto {repeated pair {1: key, 2: value}} ---
    val fileInfoOffset = file.size().toLong
    val infoProto = new ByteArrayOutputStream()
    for ((k, v) <- fileInfo) {
      val pair = new ByteArrayOutputStream()
      pair.write(0x0a) // field 1 (key), length-delimited
      val kb = k.getBytes("UTF-8")
      writeVarint(pair, kb.length.toLong)
      pair.write(kb, 0, kb.length)
      pair.write(0x12) // field 2 (value), length-delimited
      writeVarint(pair, v.length.toLong)
      pair.write(v, 0, v.length)
      val pb = pair.toByteArray
      infoProto.write(0x0a) // InfoProto field 1 (map entry), length-delimited
      writeVarint(infoProto, pb.length.toLong)
      infoProto.write(pb, 0, pb.length)
    }
    val infoPayload = new ByteArrayOutputStream()
    infoPayload.write(PbufMagic, 0, 4)
    val ip = infoProto.toByteArray
    writeVarint(infoPayload, ip.length.toLong)
    infoPayload.write(ip, 0, ip.length)
    val infoBlock = block(FileInfoMagic, infoPayload.toByteArray, loadOnOpenOffset)
    file.write(infoBlock, 0, infoBlock.length)

    // --- 4096-byte trailer ------------------------------------------------
    val proto = new ByteArrayOutputStream()
    def varintField(field: Int, v: Long): Unit = {
      writeVarint(proto, (field << 3).toLong); writeVarint(proto, v)
    }
    varintField(1, fileInfoOffset)
    varintField(2, loadOnOpenOffset)
    varintField(5, groups.size.toLong) // dataIndexCount
    varintField(6, 0L) // metaIndexCount
    varintField(7, records.size.toLong) // entryCount
    varintField(8, 1L) // numDataIndexLevels
    varintField(9, firstDataOffset)
    varintField(10, lastDataOffset)
    varintField(12, 2L) // compression NONE
    val trailer = new ByteArrayOutputStream()
    trailer.write(TrailerMagic, 0, MagicLength)
    val pb = proto.toByteArray
    writeVarint(trailer, pb.length.toLong)
    trailer.write(pb, 0, pb.length)
    val t = trailer.toByteArray
    require(t.length <= TrailerSize - 4, "HFile trailer proto overflow")
    file.write(t, 0, t.length)
    file.write(new Array[Byte](TrailerSize - 4 - t.length), 0, TrailerSize - 4 - t.length)
    // version: minor(1 byte) then 3-byte major = 3
    file.write(0); file.write(0); file.write(0); file.write(3)
    file.toByteArray
  }
}
