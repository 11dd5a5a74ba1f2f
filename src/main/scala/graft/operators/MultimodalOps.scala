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
    * byte content. A production build replaces ONLY the body (e.g. with
    * javax.imageio or a JNI codec); the batch shape, schema and
    * per-partition initialization stay exactly as written.
    */
  def decodeImageStub(data: Array[Byte]): (Int, Int, Int) = {
    var h = 1125899906842597L
    var i = 0
    while (i < math.min(data.length, 256)) { h = 31 * h + (data(i) & 0xff); i += 1 }
    val w = 16 + math.floorMod(h, 240).toInt
    val ht = 16 + math.floorMod(h >> 8, 240).toInt
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
