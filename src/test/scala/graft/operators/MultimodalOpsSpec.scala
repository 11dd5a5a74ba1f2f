package graft.operators

import graft.SparkTestBase

/** The multimodal pipeline plumbing: sniffing is real, decode is the
  * deterministic stub, everything runs distributed with per-partition
  * batch shape and typed schemas.
  */
class MultimodalOpsSpec extends SparkTestBase {
  import MultimodalOps._

  test("magic-byte sniffing recognizes containers") {
    assert(sniffMime(Array(0x89.toByte, 'P', 'N', 'G', 13, 10)) == "image/png")
    assert(sniffMime(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte)) == "image/jpeg")
    assert(sniffMime("GIF89a".getBytes) == "image/gif")
    assert(sniffMime("RIFF1234WAVE".getBytes) == "audio/wav")
    assert(sniffMime(Array[Byte](0, 0, 0, 24, 'f', 't', 'y', 'p')) == "video/mp4")
    assert(sniffMime("hello".getBytes) == "application/octet-stream")
  }

  test("blob corpus is distributed and typed") {
    val blobs = syntheticBlobs(spark, sfDir)
    assert(blobs.rdd.getNumPartitions >= 1)
    val first = blobs.head()
    assert(first.mime == "image/png" && sniffMime(first.data) == "image/png")
  }

  test("stub decode is deterministic and batch-shaped") {
    val blobs = syntheticBlobs(spark, sfDir)
    val metas = decodeImages(blobs)
    val a = metas.collect().map(m => m.doc_id -> (m.width, m.height)).toMap
    val b = decodeImages(blobs).collect().map(m => m.doc_id -> (m.width, m.height)).toMap
    assert(a == b && a.nonEmpty)
    assert(a.values.forall { case (w, h) => w >= 16 && h >= 16 && w < 256 && h < 256 })
  }

  test("frame sampling yields bounded, ordered offsets") {
    val frames = sampleFrames(syntheticBlobs(spark, sfDir).limit(10), maxFrames = 4).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.values.forall(fs => fs.length <= 4 && fs.map(_.byte_offset).sorted.sameElements(fs.map(_.byte_offset))))
  }

  test("byte stats distributed query runs") {
    assert(byteStats(spark, sfDir).count() > 0)
  }
}
