package graft.hfile

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream
import scala.collection.mutable

/** Reader for HBase-style HFile v3 — the base-file format of Hudi's
  * metadata table (S8; reference: crates/core/src/hfile/, format spec
  * hudi-io/hfile_format.md). Scope matches the reference reader: v3 files,
  * NONE/GZIP block compression, single- and multi-level data block
  * indexes, file-info protobuf, full iteration, sorted point lookups, and
  * prefix scans. MVCC timestamps are rejected like the reference
  * (Hudi always writes version 0 cells).
  *
  * Whole-file byte-array input is intentional: metadata-table base files
  * are small (the reference reader does the same), and consumers run on
  * the driver during planning.
  */
object HFileFormat {
  val MagicLength = 8
  val TrailerSize = 4096
  val BlockHeaderSize: Int = MagicLength + 4 + 4 + 8 + 1 + 4 + 4 // = 33

  val DataMagic = "DATABLK*".getBytes("UTF-8")
  val DataMagicEnc = "DATABLKE".getBytes("UTF-8")
  val LeafIndexMagic = "IDXLEAF2".getBytes("UTF-8")
  val MetaMagic = "METABLKc".getBytes("UTF-8")
  val IntermediateIndexMagic = "IDXINTE2".getBytes("UTF-8")
  val RootIndexMagic = "IDXROOT2".getBytes("UTF-8")
  val FileInfoMagic = "FILEINF2".getBytes("UTF-8")
  val TrailerMagic = "TRABLK\"$".getBytes("UTF-8")
  val PbufMagic = "PBUF".getBytes("UTF-8")

  /** Hadoop WritableUtils VLong: (value, bytesConsumed). */
  def readVLong(bytes: Array[Byte], offset: Int): (Long, Int) = {
    val first = bytes(offset)
    if (first >= -112) (first.toLong, 1)
    else {
      val size = -111 - first
      var value = 0L
      var i = 0
      while (i < size - 1) {
        value = (value << 8) | (bytes(offset + 1 + i) & 0xffL)
        i += 1
      }
      if (first < -120) (~value, size) else (value, size)
    }
  }

  /** Protobuf varint: (value, bytesConsumed). */
  def readVarint(bytes: Array[Byte], offset: Int): (Long, Int) = {
    var result = 0L
    var shift = 0
    var pos = offset
    var done = false
    while (!done && pos < bytes.length) {
      val b = bytes(pos) & 0xff
      pos += 1
      result |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) done = true
      shift += 7
    }
    (result, pos - offset)
  }

  def beInt(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  def beLong(b: Array[Byte], o: Int): Long =
    (beInt(b, o).toLong << 32) | (beInt(b, o + 4).toLong & 0xffffffffL)

  def beShort(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
}

/** Minimal protobuf walker for the two HBase messages the format embeds
  * (TrailerProto and InfoProto — hfile/proto.rs); hands each (fieldNumber,
  * value) to a callback. Wire types: 0 varint, 2 length-delimited.
  */
private[hfile] object ProtoWalk {
  def apply(bytes: Array[Byte], from: Int, to: Int)(
      onVarint: (Int, Long) => Unit, onBytes: (Int, Array[Byte]) => Unit): Unit = {
    var pos = from
    while (pos < to) {
      val (tag, n1) = HFileFormat.readVarint(bytes, pos)
      pos += n1
      val field = (tag >> 3).toInt
      (tag & 7) match {
        case 0 =>
          val (v, n2) = HFileFormat.readVarint(bytes, pos)
          pos += n2
          onVarint(field, v)
        case 2 =>
          val (len, n2) = HFileFormat.readVarint(bytes, pos)
          pos += n2
          onBytes(field, java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt))
          pos += len.toInt
        case 5 => pos += 4 // fixed32 (not used)
        case 1 => pos += 8 // fixed64 (not used)
        case other => throw new IllegalStateException(s"Unsupported protobuf wire type $other")
      }
    }
  }
}

/** Parsed fixed-size trailer (trailer.rs:30-127). */
final case class HFileTrailer(
    majorVersion: Int,
    minorVersion: Int,
    fileInfoOffset: Long,
    loadOnOpenDataOffset: Long,
    dataIndexCount: Int,
    metaIndexCount: Int,
    entryCount: Long,
    numDataIndexLevels: Int,
    firstDataBlockOffset: Long,
    lastDataBlockOffset: Long,
    compressionCodec: Int // 2 = NONE, 1 = GZIP (compression.rs:46-60)
)

object HFileTrailer {
  def read(bytes: Array[Byte]): HFileTrailer = {
    import HFileFormat._
    require(bytes.length >= TrailerSize, s"File too small for HFile trailer: ${bytes.length}")
    val start = bytes.length - TrailerSize
    require(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, start, start + MagicLength), TrailerMagic),
      "Invalid HFile trailer magic")
    val minor = bytes(bytes.length - 4) & 0xff
    val major = ((bytes(bytes.length - 3) & 0xff) << 16) |
      ((bytes(bytes.length - 2) & 0xff) << 8) | (bytes(bytes.length - 1) & 0xff)
    require(major == 3, s"Unsupported HFile version $major.$minor (need v3)")
    val (protoLen, consumed) = readVarint(bytes, start + MagicLength)
    var fileInfoOffset, loadOnOpen, entryCount = 0L
    var firstData, lastData = 0L
    var dataIdx, metaIdx = 0
    var levels = 1
    var codec = 2
    ProtoWalk(bytes, start + MagicLength + consumed,
      start + MagicLength + consumed + protoLen.toInt)(
      onVarint = (f, v) => f match {
        case 1 => fileInfoOffset = v
        case 2 => loadOnOpen = v
        case 5 => dataIdx = v.toInt
        case 6 => metaIdx = v.toInt
        case 7 => entryCount = v
        case 8 => levels = v.toInt
        case 9 => firstData = v
        case 10 => lastData = v
        case 12 => codec = v.toInt
        case _ => ()
      },
      onBytes = (_, _) => ())
    HFileTrailer(major, minor, fileInfoOffset, loadOnOpen, dataIdx, metaIdx,
      entryCount, levels, firstData, lastData, codec)
  }
}

/** Index entry: first key content of a block + its file offset/size. */
final case class BlockIndexEntry(firstKeyContent: Array[Byte], offset: Long, size: Int)

/** An owned record: UTF-8 key content + raw (avro) value bytes. Empty
  * value = deletion tombstone in metadata-table semantics (record.rs).
  */
final case class HFileRecord(key: String, value: Array[Byte]) {
  def isDeleted: Boolean = value.isEmpty
}

final class HFileReader(bytes: Array[Byte]) {
  import HFileFormat._

  val trailer: HFileTrailer = HFileTrailer.read(bytes)

  private def decompress(data: Array[Byte], uncompressedSize: Int): Array[Byte] =
    trailer.compressionCodec match {
      case 2 => data
      case 1 =>
        // decompression-bomb bound (the readSized discipline): a corrupt
        // header declaring a multi-GB uncompressed size must fail closed
        // before the allocation. Real HBase blocks are 64 KB-1 MB; 64 MB
        // is generous headroom for any MDT block.
        require(uncompressedSize >= 0 && uncompressedSize <= (64 << 20),
          s"hfile: implausible uncompressed block size $uncompressedSize")
        val in = new GZIPInputStream(new ByteArrayInputStream(data))
        try {
          val out = new Array[Byte](uncompressedSize)
          var read = 0
          while (read < uncompressedSize) {
            val n = in.read(out, read, uncompressedSize - read)
            if (n < 0) throw new IllegalStateException("GZIP stream ended early")
            read += n
          }
          out
        } finally in.close()
      case other => throw new IllegalStateException(s"Unsupported HFile compression codec $other")
    }

  /** (blockMagic, uncompressed block data, onDiskSizeWithHeader). */
  private def readBlock(offset: Int): (Array[Byte], Array[Byte], Int) = {
    val magic = java.util.Arrays.copyOfRange(bytes, offset, offset + MagicLength)
    val onDiskSize = beInt(bytes, offset + 8)
    val uncompressedSize = beInt(bytes, offset + 12)
    val bytesPerChecksum = beInt(bytes, offset + 25)
    // exact checksum accounting from the header's own field (offset +29,
    // HBase v2/v3 block layout): onDiskDataSizeWithHeader = header + data
    // WITHOUT checksum chunks. Estimating chunk count from the total
    // on-disk size (which already includes the checksum bytes) over-counts
    // by one chunk whenever header+data lands on a chunk boundary,
    // truncating a compressed slice by 4 bytes.
    val onDiskDataSizeWithHeader = beInt(bytes, offset + 29)
    val onDiskWithHeader = BlockHeaderSize + onDiskSize
    val checksumBytes =
      if (bytesPerChecksum <= 0) 0 // checksum type NULL writes no chunks
      else if (onDiskDataSizeWithHeader > 0 && onDiskDataSizeWithHeader <= onDiskWithHeader)
        onDiskWithHeader - onDiskDataSizeWithHeader
      else ((onDiskWithHeader + bytesPerChecksum - 1) / bytesPerChecksum) * 4
    val dataStart = offset + BlockHeaderSize
    // BOTH paths' header-declared sizes bound against the file BEFORE any
    // allocation (the readSized discipline): copyOfRange would zero-pad a
    // size past EOF into a silently-garbage block or attempt a multi-GB
    // allocation from a corrupt header.
    // (uncompressedSize may legitimately exceed the file tail on the GZIP
    // path — decompress() bounds that branch at 64 MB instead)
    require(onDiskSize >= 0 && uncompressedSize >= 0 &&
      dataStart + onDiskSize.toLong <= bytes.length &&
      (trailer.compressionCodec != 2 || dataStart + uncompressedSize.toLong <= bytes.length),
      s"hfile: block at $offset declares onDisk=$onDiskSize uncompressed=$uncompressedSize " +
        s"beyond the ${bytes.length}-byte file")
    val data =
      if (trailer.compressionCodec == 2)
        java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + uncompressedSize)
      else
        decompress(
          java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + onDiskSize - checksumBytes),
          uncompressedSize)
    (magic, data, onDiskWithHeader)
  }

  private def isMagic(m: Array[Byte], expected: Array[Byte]): Boolean =
    java.util.Arrays.equals(m, expected)

  /** Root index entries (reader.rs:303-357): per entry offset(8) size(4)
    * vlong keyLen + key bytes. Data-index keys are structured (2B content
    * length prefix); meta-index keys are bare content.
    */
  private def parseRootEntries(data: Array[Byte], n: Int, contentKeyOnly: Boolean): Vector[BlockIndexEntry] = {
    val out = Vector.newBuilder[BlockIndexEntry]
    var pos = 0
    for (_ <- 0 until n) {
      val blockOffset = beLong(data, pos); pos += 8
      val blockSize = beInt(data, pos); pos += 4
      val (keyLen, consumed) = readVLong(data, pos); pos += consumed
      val keyBytes = java.util.Arrays.copyOfRange(data, pos, pos + keyLen.toInt)
      pos += keyLen.toInt
      val content =
        if (contentKeyOnly) keyBytes
        else {
          val cl = beShort(keyBytes, 0)
          java.util.Arrays.copyOfRange(keyBytes, 2, 2 + cl)
        }
      out += BlockIndexEntry(content, blockOffset, blockSize)
    }
    out.result()
  }

  /** Leaf/intermediate index entries (reader.rs:359-418): count(4),
    * secondary offsets((n+1)*4), then per entry offset(8) size(4) key.
    */
  private def parseLeafEntries(data: Array[Byte]): Vector[BlockIndexEntry] = {
    val n = beInt(data, 0)
    val rel = (0 to n).map(i => beInt(data, 4 + i * 4))
    val base = 4 + (n + 1) * 4
    (0 until n).map { i =>
      val off = base + rel(i)
      val blockOffset = beLong(data, off)
      val blockSize = beInt(data, off + 8)
      val keyStart = off + 12
      val keyEnd = base + rel(i + 1)
      val keyBytes = java.util.Arrays.copyOfRange(data, keyStart, keyEnd)
      val cl = beShort(keyBytes, 0)
      BlockIndexEntry(java.util.Arrays.copyOfRange(keyBytes, 2, 2 + cl), blockOffset, blockSize)
    }.toVector
  }

  val (dataIndex: Vector[BlockIndexEntry],
       metaIndex: Map[String, BlockIndexEntry],
       fileInfo: Map[String, Array[Byte]]) = {
    var pos = trailer.loadOnOpenDataOffset.toInt
    // root data index
    val (m1, d1, sz1) = readBlock(pos)
    require(isMagic(m1, RootIndexMagic), "Expected ROOT_INDEX block")
    var entries = parseRootEntries(d1, trailer.dataIndexCount, contentKeyOnly = false)
    pos += sz1
    // multi-level: BFS through intermediate/leaf index blocks (reader.rs:263-301)
    var levels = trailer.numDataIndexLevels - 1
    while (levels > 0) {
      entries = entries.flatMap { e =>
        val (_, d, _) = readBlock(e.offset.toInt)
        parseLeafEntries(d)
      }
      levels -= 1
    }
    // meta index (same root-index layout, bare keys; always present)
    val meta = mutable.LinkedHashMap.empty[String, BlockIndexEntry]
    val (m2, d2, sz2) = readBlock(pos)
    require(isMagic(m2, RootIndexMagic), "Expected meta ROOT_INDEX block")
    parseRootEntries(d2, trailer.metaIndexCount, contentKeyOnly = true)
      .foreach(e => meta(new String(e.firstKeyContent, "UTF-8")) = e)
    pos += sz2
    // file info (PBUF-prefixed InfoProto)
    val (m3, d3, _) = readBlock(trailer.fileInfoOffset.toInt)
    require(isMagic(m3, FileInfoMagic), "Expected FILE_INFO block")
    require(d3.length >= 4 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(d3, 0, 4), PbufMagic), "File info missing PBUF magic")
    val (infoLen, consumed) = readVarint(d3, 4)
    val info = mutable.LinkedHashMap.empty[String, Array[Byte]]
    ProtoWalk(d3, 4 + consumed, 4 + consumed + infoLen.toInt)(
      onVarint = (_, _) => (),
      onBytes = (field, pair) => if (field == 1) {
        var k: Array[Byte] = Array.emptyByteArray
        var v: Array[Byte] = Array.emptyByteArray
        ProtoWalk(pair, 0, pair.length)(
          onVarint = (_, _) => (),
          onBytes = (f, b) => if (f == 1) k = b else if (f == 2) v = b)
        info(new String(k, "UTF-8")) = v
      })
    // MVCC cells unsupported, like the reference (reader.rs:192-223)
    for {
      ver <- info.get("KEY_VALUE_VERSION") if ver.length >= 4 && beInt(ver, 0) == 1
      ts <- info.get("MAX_MEMSTORE_TS_KEY") if ts.length >= 8 && beLong(ts, 0) > 0
    } throw new IllegalStateException("HFiles with MVCC timestamps are not supported")
    (entries, meta.toMap, info.toMap)
  }

  def numEntries: Long = trailer.entryCount

  /** Avro writer schema from file info (`schema` key), if present. */
  def avroSchemaJson: Option[String] =
    fileInfo.get("schema").map(new String(_, "UTF-8"))

  def minMaxRecordKeys: Option[(String, String)] =
    for (mn <- fileInfo.get("minRecordKey"); mx <- fileInfo.get("maxRecordKey"))
      yield (new String(mn, "UTF-8"), new String(mx, "UTF-8"))

  /** All (key content, value) cells of one data block. Cell layout
    * (key.rs:158-265): keyLen(4) valLen(4) key(2B contentLen + content +
    * rest) value, then 1 MVCC byte (always 0 for Hudi).
    */
  private def blockRecords(entry: BlockIndexEntry): Iterator[HFileRecord] = {
    val (magic, data, _) = readBlock(entry.offset.toInt)
    require(isMagic(magic, DataMagic) || isMagic(magic, DataMagicEnc), "Expected DATA block")
    // DATABLKE payloads start with a 2-byte data-block-encoding id and
    // PREFIX/DIFF/FAST_DIFF/ROW_INDEX-encoded cells — parsing them with
    // the plain layout would read garbage lengths. Hudi's MDT writes
    // encoding NONE (plain DATABLK); fail loudly on anything else.
    if (isMagic(magic, DataMagicEnc)) {
      val encodingId = if (data.length >= 2) beShort(data, 0) else -1
      throw new UnsupportedOperationException(
        s"HFile data-block encoding id $encodingId is not supported " +
          "(Hudi metadata tables write unencoded data blocks)")
    }
    new Iterator[HFileRecord] {
      private var pos = 0
      override def hasNext: Boolean = pos + 8 <= data.length
      override def next(): HFileRecord = {
        val keyLen = beInt(data, pos)
        val valLen = beInt(data, pos + 4)
        val keyOff = pos + 8
        val contentLen = beShort(data, keyOff)
        val key = new String(data, keyOff + 2, contentLen, "UTF-8")
        val value = java.util.Arrays.copyOfRange(data, keyOff + keyLen, keyOff + keyLen + valLen)
        pos += 8 + keyLen + valLen + 1 // +1 MVCC version byte
        HFileRecord(key, value)
      }
    }
  }

  /** Full scan in key order. */
  def records: Iterator[HFileRecord] = dataIndex.iterator.flatMap(blockRecords)

  /** Records whose key starts with `prefix` (index-pruned: only blocks
    * whose key range can intersect the prefix are read).
    */
  def recordsByPrefix(prefix: String): Vector[HFileRecord] = {
    val p = prefix.getBytes("UTF-8")
    val from = floorBlockIdx(p)
    dataIndex.drop(math.max(from, 0)).iterator
      .takeWhile(e => java.util.Arrays.compare(e.firstKeyContent,
        // stop once a block starts past every possible prefixed key
        p) <= 0 || startsWith(e.firstKeyContent, p))
      .flatMap(blockRecords)
      .filter(_.key.startsWith(prefix))
      .toVector
  }

  private def startsWith(key: Array[Byte], prefix: Array[Byte]): Boolean =
    key.length >= prefix.length &&
      java.util.Arrays.equals(java.util.Arrays.copyOfRange(key, 0, prefix.length), prefix)

  /** Index of the last block whose first key is <= `key` (-1 if before all). */
  private def floorBlockIdx(key: Array[Byte]): Int = {
    var lo = 0
    var hi = dataIndex.size - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (java.util.Arrays.compare(dataIndex(mid).firstKeyContent, key) <= 0) {
        ans = mid; lo = mid + 1
      } else hi = mid - 1
    }
    ans
  }

  /** Point lookups, batched by floor block: keys are bucketed to their
    * floor block first and each needed block is decoded exactly ONCE for
    * its whole key group — a per-key decode would re-read and re-decode
    * the same block for every one of its keys (measured 2x on a 21k-key
    * record-index batch).
    */
  def lookup(keys: Seq[String]): Map[String, HFileRecord] = {
    val out = Map.newBuilder[String, HFileRecord]
    for ((idx, ks) <- keys.groupBy(k => floorBlockIdx(k.getBytes("UTF-8"))) if idx >= 0) {
      val wanted = ks.toSet
      for (r <- blockRecords(dataIndex(idx)) if wanted.contains(r.key))
        out += r.key -> r
    }
    out.result()
  }
}
