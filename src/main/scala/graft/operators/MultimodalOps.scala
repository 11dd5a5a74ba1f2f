package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque `binary` with typed
  * metadata — the LLM-pipeline pattern for media corpora at 100 TB:
  *
  *  - blobs stay in parquet binary columns, never collected;
  *  - per-partition batch processing (`mapPartitions`) so a real decoder
  *    (libjpeg/ffmpeg/soundfile) is initialized once per task, not per
  *    row — the JVM analog of `mapInPandas` batch shape;
  *  - magic-byte container sniffing is REAL; pixel/sample decoding is a
  *    clearly-marked deterministic STUB (no imaging libs ship in this
  *    environment) with the production signature kept.
  *
  * The byte-level plumbing (schemas, hex/digest ops) is oracle-checked via
  * `media_byte_stats`, which synthesizes the blob column deterministically
  * from `documents.text` in both engines.
  */
object MultimodalOps {

  /** An opaque media blob row. */
  final case class MediaBlob(doc_id: Long, mime: String, data: Array[Byte])

  /** Decoded image metadata (stub output). */
  final case class ImageMeta(doc_id: Long, width: Int, height: Int, channels: Int, ok: Boolean)

  /** Sampled video frame reference. */
  final case class FrameRef(doc_id: Long, frame_index: Int, byte_offset: Long)

  /** REAL container sniffing from magic bytes (the part that never needs
    * a codec): PNG/JPEG/GIF/RIFF-WAV/MP4/unknown.
    */
  def sniffMime(data: Array[Byte]): String = {
    def at(i: Int): Int = if (i < data.length) data(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "image/png"
    else if (at(0) == 0xff && at(1) == 0xd8) "image/jpeg"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F') "image/gif"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
      at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') "audio/wav"
    else if (at(4) == 'f' && at(5) == 't' && at(6) == 'y' && at(7) == 'p') "video/mp4"
    else "application/octet-stream"
  }

  /** STUB image decode — deterministic fake dimensions derived from the
    * byte content (31-polynomial hash over the first 256 bytes, UNSIGNED
    * mod-2^64 arithmetic so the same fold is expressible in oracle SQL —
    * see `imageMetaOracle`). A production build replaces ONLY the body
    * (e.g. with javax.imageio or a JNI codec); the batch shape, schema
    * and per-partition initialization stay exactly as written.
    */
  def decodeImageStub(data: Array[Byte]): (Int, Int, Int) = {
    var h = 1125899906842597L
    var i = 0
    while (i < math.min(data.length, 256)) { h = 31 * h + (data(i) & 0xff); i += 1 }
    val w = 16 + java.lang.Long.remainderUnsigned(h, 240).toInt
    val ht = 16 + java.lang.Long.remainderUnsigned(h >>> 8, 240).toInt
    (w, ht, 3)
  }

  /** Batch image decode: one "decoder" per partition, rows streamed. */
  def decodeImages(blobs: Dataset[MediaBlob]): Dataset[ImageMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // production: val decoder = Codec.open() — once per task
      it.map { b =>
        val (w, h, c) = decodeImageStub(b.data)
        ImageMeta(b.doc_id, w, h, c, ok = b.mime.startsWith("image/"))
      }
    }
  }

  /** Deterministic frame sampling for "video" blobs: every `stride` bytes
    * stands in for a keyframe offset (real impl: container index parse).
    */
  def sampleFrames(blobs: Dataset[MediaBlob], maxFrames: Int): Dataset[FrameRef] = {
    import blobs.sparkSession.implicits._
    blobs.flatMap { b =>
      val n = math.min(maxFrames, math.max(1, b.data.length / 64))
      val stride = math.max(1, b.data.length / n)
      (0 until n).map(i => FrameRef(b.doc_id, i, i.toLong * stride))
    }
  }

  /** Synthetic blob corpus derived from documents (deterministic): a fake
    * PNG header + the UTF-8 text bytes. At scale this would be
    * `spark.read.parquet(...)` over real binary columns — same schema.
    */
  def syntheticBlobs(spark: SparkSession, sfDir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    val header = Array[Byte](0x89.toByte, 'P', 'N', 'G')
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = header ++ text.getBytes("UTF-8")
        MediaBlob(id, "image/png", bytes)
      }
  }

  /** Mixed-container corpus: per doc, one of five REAL magic-byte headers
    * (PNG / JPEG / GIF / RIFF-WAV / MP4-ftyp) chosen by `doc_id % 5`,
    * prepended to the utf-8 text bytes — the multi-modality shape of a
    * real media lake, with `mime` derived by actually parsing the bytes
    * through [[sniffMime]] (never from the class label).
    */
  private val mixedHeaders: Array[Array[Byte]] = Array(
    Array(0x89, 'P', 'N', 'G').map(_.toByte),
    Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte),
    Array[Byte]('G', 'I', 'F', '8'),
    "RIFF".getBytes("UTF-8") ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes("UTF-8"),
    Array[Byte](0, 0, 0, 0x18) ++ "ftyp".getBytes("UTF-8"))

  /** Header bytes for a doc id — the [[syntheticBlobsMixed]] synthesis,
    * exposed for fixtures that persist the same blobs (Lance media table).
    */
  def mixedHeader(id: Long): Array[Byte] = mixedHeaders((id % 5).toInt)

  def syntheticBlobsMixed(spark: SparkSession, sfDir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    val headers = mixedHeaders
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = headers((id % 5).toInt) ++ text.getBytes("UTF-8")
        MediaBlob(id, sniffMime(bytes), bytes)
      }
  }

  /** Oracle-checked container sniffing: the mime column is produced by
    * parsing the magic bytes on the Spark side; the oracle knows which
    * header each doc got and asserts the parse recovered it.
    */
  def mimeSniff(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    syntheticBlobsMixed(spark, sfDir)
      .map(b => (b.doc_id, b.mime, b.data.length.toLong))
      .toDF("doc_id", "mime", "n_bytes")
      .orderBy("doc_id")
  }

  val mimeSniffOracle: String =
    """SELECT doc_id,
      |  CASE CAST(doc_id % 5 AS INT)
      |    WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
      |    WHEN 2 THEN 'image/gif' WHEN 3 THEN 'audio/wav'
      |    ELSE 'video/mp4' END AS mime,
      |  CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN
      |      (CASE WHEN doc_id % 5 = 3 THEN 12 ELSE 8 END)
      |    ELSE 4 END + octet_length(encode(text)) AS BIGINT) AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Oracle-checked image-decode plumbing END-TO-END: mixed blobs →
    * [[decodeImages]] (the per-partition typed batch pipeline) → metadata
    * rows, hash-checked against closed-form SQL that refolds the SAME
    * 31-polynomial over the same bytes (hex-pair decode + HUGEINT
    * mod-2^64 reduce) — so a change to the batch shape, the byte
    * assembly, or the stub arithmetic fails the oracle loudly.
    */
  def imageMeta(spark: SparkSession, sfDir: String): DataFrame = {
    decodeImages(syntheticBlobsMixed(spark, sfDir)).toDF()
      .orderBy("doc_id")
  }

  val imageMetaOracle: String =
    """WITH hdr AS (
      |  SELECT doc_id, CASE CAST(doc_id % 5 AS INT)
      |    WHEN 0 THEN '89504E47' WHEN 1 THEN 'FFD8FFE0' WHEN 2 THEN '47494638'
      |    WHEN 3 THEN '524946460000000057415645' ELSE '0000001866747970' END
      |    || upper(hex(encode(text))) AS h
      |  FROM documents),
      |lim AS (SELECT doc_id, substr(h, 1, CAST(2*LEAST(256, length(h)//2) AS INT)) AS h2 FROM hdr),
      |hs AS (SELECT doc_id, list_reduce(
      |    list_prepend(CAST(1125899906842597 AS HUGEINT),
      |      list_transform(range(0, length(h2)//2),
      |        i -> CAST(CAST(('0x' || substr(h2, CAST(2*i+1 AS INT), 2)) AS INT) AS HUGEINT))),
      |    (a, b) -> (a * 31 + b) % CAST('18446744073709551616' AS HUGEINT)) AS u
      |  FROM lim)
      |SELECT doc_id, CAST(16 + u % 240 AS INT) AS width,
      |  CAST(16 + (u // 256) % 240 AS INT) AS height, 3 AS channels,
      |  (doc_id % 5) < 3 AS ok
      |FROM hs ORDER BY doc_id""".stripMargin

  /** Parsed WAV metadata (REAL parse output, not a stub). */
  final case class WavMeta(doc_id: Long, sample_rate: Int, channels: Int,
      bits: Int, duration_ms: Long, ok: Boolean)

  /** REAL RIFF/WAVE chunk walk: iterate `(id, size)` chunks after the
    * 12-byte RIFF header, read PCM params from `fmt ` and payload length
    * from `data`. This is the production parser — nothing stubbed; only
    * sample DECODE (which needs a codec) is out of scope.
    */
  def parseWav(data: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u16(i: Int): Int = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (data(i) & 0xffL) | ((data(i + 1) & 0xffL) << 8) |
        ((data(i + 2) & 0xffL) << 16) | ((data(i + 3) & 0xffL) << 24)
    def tag(i: Int): String = new String(data, i, 4, "US-ASCII")
    if (data.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (sampleRate, channels, bits, byteRate)
    var dataSize: Option[Long] = None
    while (off + 8 <= data.length && (fmt.isEmpty || dataSize.isEmpty)) {
      val id = tag(off)
      val size = u32(off + 4)
      if (id == "fmt " && off + 8 + 16 <= data.length)
        fmt = Some((u32(off + 12).toInt, u16(off + 10), u16(off + 22), u32(off + 16).toInt))
      else if (id == "data")
        dataSize = Some(size)
      // size is an unsigned u32: >= 2^31 would truncate negative in
      // toInt and walk off backwards (infinite loop / OOB tag). Malformed
      // input -> None, never a hang.
      if (size > Int.MaxValue - 16L) return None
      val next = off + 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      if (next <= off) return None
      off = next
    }
    for ((rate, ch, bits, byteRate) <- fmt; ds <- dataSize if byteRate > 0)
      yield (rate, ch, bits, ds * 1000L / byteRate)
  }

  /** Deterministic VALID WAV corpus: pcm params derived from doc_id, the
    * utf-8 text bytes as payload — every blob is a well-formed RIFF file
    * the real parser must walk.
    */
  /** A member of a WebDataset-style tar shard. */
  final case class TarMember(doc_id: Long, member: String, data_offset: Long, size: Long)

  /** Synthesize a valid POSIX (ustar) tar per document — the WebDataset
    * shard shape: `<id>.txt` carrying the document bytes and `<id>.cls`
    * carrying a small sidecar — so the REAL tar header walk below has
    * honest bytes to parse (512-byte headers, octal size fields, NUL
    * padding, ustar magic, checksum).
    */
  def syntheticTarBlobs(spark: SparkSession, sfDir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val m1 = text.getBytes("UTF-8")
        val m2 = s"doc$id".getBytes("UTF-8")
        def pad(n: Int): Int = ((n + 511) / 512) * 512
        def header(name: String, size: Int): Array[Byte] = {
          val h = new Array[Byte](512)
          val nb = name.getBytes("US-ASCII")
          System.arraycopy(nb, 0, h, 0, nb.length)
          def oct(v: Long, off: Int, len: Int): Unit = {
            val s = java.lang.Long.toOctalString(v)
            val p = ("0" * (len - 1 - s.length)) + s
            val b = p.getBytes("US-ASCII")
            System.arraycopy(b, 0, h, off, b.length) // trailing NUL already 0
          }
          oct(420, 100, 8); oct(0, 108, 8); oct(0, 116, 8) // mode/uid/gid
          oct(size.toLong, 124, 12); oct(0, 136, 12) // size / mtime
          h(156) = '0' // regular file
          System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5)
          h(263) = '0'; h(264) = '0' // version "00"
          java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum spaces
          val sum = h.iterator.map(_ & 0xff).sum
          val cs = java.lang.Long.toOctalString(sum.toLong)
          val csb = (("0" * (6 - cs.length)) + cs).getBytes("US-ASCII")
          System.arraycopy(csb, 0, h, 148, csb.length)
          h(154) = 0; h(155) = ' ' // NUL + space terminate the field
          h
        }
        val out = java.nio.ByteBuffer.allocate(
          512 + pad(m1.length) + 512 + pad(m2.length) + 1024)
        out.put(header(s"$id.txt", m1.length)).put(m1)
          .put(new Array[Byte](pad(m1.length) - m1.length))
        out.put(header(s"$id.cls", m2.length)).put(m2)
          .put(new Array[Byte](pad(m2.length) - m2.length))
        // two zero blocks terminate the archive
        MediaBlob(id, "application/x-tar", out.array())
      }
  }

  /** REAL tar header walk — the index a WebDataset reader seeks with
    * (member name → byte offset + size lets a 100 TB shard store serve
    * random access without scanning): NUL-terminated name, octal size at
    * 124, ustar magic verified, data at header+512, next header at
    * data + ceil(size/512)*512, zero block terminates. Parse failures
    * drop the blob's members (fail-open inventory, never a wrong entry).
    */
  def tarIndexMembers(docId: Long, data: Array[Byte]): Seq[TarMember] = try {
    val out = scala.collection.mutable.ArrayBuffer.empty[TarMember]
    var off = 0L
    while (off + 512 <= data.length) {
      val o = off.toInt
      if (data(o) == 0) return out.toSeq // zero block = end of archive
      val magic = new String(data, o + 257, 5, "US-ASCII")
      if (magic != "ustar") return Seq.empty
      val nameEnd = {
        var i = o
        while (i < o + 100 && data(i) != 0) i += 1
        i
      }
      val name = new String(data, o, nameEnd - o, "US-ASCII")
      val sizeStr = new String(data, o + 124, 12, "US-ASCII")
        .takeWhile(c => c >= '0' && c <= '7')
      val size = java.lang.Long.parseLong(if (sizeStr.isEmpty) "0" else sizeStr, 8)
      // a hostile/corrupt 12-octal-digit size can reach 8^12-1 (~64 GiB):
      // unvalidated it would overflow the Int advance to a negative
      // offset and crash the walk — honor the fail-open contract instead
      // (a member that cannot fit in the blob is a structural lie; drop
      // the whole blob's inventory, never emit a wrong entry)
      if (size < 0 || off + 512 + size > data.length) return Seq.empty
      out += TarMember(docId, name, off + 512, size)
      off += 512 + ((size + 511) / 512) * 512
    }
    out.toSeq
  } catch { case scala.util.control.NonFatal(_) => Seq.empty } // fail-open: no wrong entries

  def tarIndex(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    val enc = Encoders.product[TarMember]
    syntheticTarBlobs(spark, sfDir).mapPartitions { it =>
      it.flatMap(b => tarIndexMembers(b.doc_id, b.data))
    }(enc).toDF().orderBy("doc_id", "data_offset")
  }

  /** The oracle re-derives each member's offset/size from the synthesis
    * formula: member 1's data sits after its 512-byte header; member 2's
    * header follows member 1's 512-padded data. A header-walk regression
    * (octal parse, padding, magic offset) diverges loudly.
    */
  val tarIndexOracle: String =
    """WITH m1 AS (
      |  SELECT doc_id, CAST(doc_id AS VARCHAR) || '.txt' AS member,
      |    CAST(512 AS BIGINT) AS data_offset,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS size
      |  FROM documents),
      |m2 AS (
      |  SELECT d.doc_id, CAST(d.doc_id AS VARCHAR) || '.cls' AS member,
      |    CAST(512 + ((m1.size + 511) // 512) * 512 + 512 AS BIGINT) AS data_offset,
      |    CAST(3 + length(CAST(d.doc_id AS VARCHAR)) AS BIGINT) AS size
      |  FROM documents d JOIN m1 ON m1.doc_id = d.doc_id)
      |SELECT doc_id, member, data_offset, size FROM m1
      |UNION ALL
      |SELECT doc_id, member, data_offset, size FROM m2
      |ORDER BY doc_id, data_offset""".stripMargin

  /** A member extracted by random access through the tar index. */
  final case class TarExtract(doc_id: Long, member: String, size: Long, digest: String)

  /** The READ side of the shard index: seek to the indexed
    * (offset, size) and slice the member bytes out — no header re-walk,
    * the access pattern a WebDataset loader runs per sample. The digest
    * of the extracted bytes must equal the digest of the original
    * document text, proving the offsets index REAL payload positions
    * (an off-by-one in the header walk or padding math corrupts the
    * digest loudly).
    */
  def tarExtract(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    val enc = Encoders.product[TarExtract]
    syntheticTarBlobs(spark, sfDir).mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { b =>
        tarIndexMembers(b.doc_id, b.data).find(_.member.endsWith(".txt")).map { m =>
          val bytes = java.util.Arrays.copyOfRange(
            b.data, m.data_offset.toInt, (m.data_offset + m.size).toInt)
          md.reset()
          val hex = md.digest(bytes).map(x => f"${x & 0xff}%02x").mkString
          TarExtract(b.doc_id, m.member, m.size, hex)
        }
      }
    }(enc).toDF().orderBy("doc_id")
  }

  val tarExtractOracle: String =
    """SELECT doc_id, CAST(doc_id AS VARCHAR) || '.txt' AS member,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS size,
      |  md5(text) AS digest
      |FROM documents ORDER BY doc_id""".stripMargin

  def syntheticWavBlobs(spark: SparkSession, sfDir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val rate = 8000 + (id % 5).toInt * 4000
        val ch = 1 + (id % 2).toInt
        val bits = 16
        val byteRate = rate * ch * (bits / 8)
        val bb = java.nio.ByteBuffer.allocate(44 + payload.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + payload.length)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(ch.toShort).putInt(rate).putInt(byteRate)
          .putShort((ch * bits / 8).toShort).putShort(bits.toShort)
          .put("data".getBytes("US-ASCII")).putInt(payload.length)
          .put(payload)
        MediaBlob(id, "audio/wav", bb.array())
      }
  }

  /** Oracle-checked REAL audio-container parsing end-to-end: blobs are
    * valid WAV files, the chunk walk recovers the pcm params and computes
    * `duration_ms = dataSize * 1000 / byteRate`, and the oracle re-derives
    * the same values from the synthesis formula — a parser regression
    * (endianness, offsets, chunk alignment) diverges loudly.
    */
  def wavMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    val enc = Encoders.product[WavMeta]
    syntheticWavBlobs(spark, sfDir).mapPartitions { it =>
      it.map { b =>
        parseWav(b.data) match {
          case Some((rate, ch, bits, ms)) => WavMeta(b.doc_id, rate, ch, bits, ms, ok = true)
          case None => WavMeta(b.doc_id, 0, 0, 0, 0L, ok = false)
        }
      }
    }(enc).toDF().orderBy("doc_id")
  }

  val wavMetaOracle: String =
    """SELECT doc_id,
      |  CAST(8000 + (doc_id % 5) * 4000 AS INT) AS sample_rate,
      |  CAST(1 + (doc_id % 2) AS INT) AS channels,
      |  16 AS bits,
      |  CAST(octet_length(encode(text)) * 1000 //
      |    ((8000 + (doc_id % 5) * 4000) * (1 + (doc_id % 2)) * 2) AS BIGINT) AS duration_ms,
      |  TRUE AS ok
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Oracle-checked byte-level surface: blob synthesized from text in both
    * engines, then length / hex-prefix / digest computed on the BINARY
    * value (the non-stubbed part of the pipeline).
    */
  def byteStats(spark: SparkSession, sfDir: String): DataFrame = {
    graft.queries.Tables.ensureView(spark, sfDir, "documents")(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    spark.sql(
      """SELECT doc_id,
        |  length(cast(text AS BINARY)) AS n_bytes,
        |  substring(hex(cast(text AS BINARY)), 1, 16) AS head_hex,
        |  md5(cast(text AS BINARY)) AS digest
        |FROM documents
        |ORDER BY doc_id""".stripMargin)
  }

  val byteStatsOracle: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  substring(upper(hex(encode(text))), 1, 16) AS head_hex,
      |  md5(text) AS digest
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Oracle-checked frame sampling: offsets are pure arithmetic over the
    * blob length (synthetic blob = 4-byte header + utf8 text), so the
    * typed Dataset pipeline (`syntheticBlobs` → `sampleFrames`) is
    * hash-checked end-to-end against closed-form SQL.
    */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    sampleFrames(syntheticBlobs(spark, sfDir), maxFrames = 8).toDF()
      .orderBy("doc_id", "frame_index")
  }

  val frameSampleOracle: String =
    """WITH blobs AS (
      |  SELECT doc_id, 4 + octet_length(encode(text)) AS n_bytes FROM documents),
      |sized AS (
      |  SELECT doc_id,
      |    LEAST(8, GREATEST(1, n_bytes // 64)) AS n,
      |    n_bytes
      |  FROM blobs)
      |SELECT doc_id, CAST(i AS INT) AS frame_index,
      |  CAST(i * GREATEST(1, n_bytes // n) AS BIGINT) AS byte_offset
      |FROM sized, UNNEST(range(0, n)) AS t(i)
      |ORDER BY doc_id, frame_index""".stripMargin
}
