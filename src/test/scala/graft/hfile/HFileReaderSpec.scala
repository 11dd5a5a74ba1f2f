package graft.hfile

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** S8 coverage against the reference's REAL metadata-table HFiles (the
  * v8 quickstart fixture ships a full `.hoodie/metadata`): trailer and
  * index parse, full iteration, file-info schema, point lookups, prefix
  * scans — mirroring crates/core/src/metadata/table tests' expectations.
  */
class HFileReaderSpec extends AnyFunSuite {

  private def fixtureFiles: Option[Seq[java.nio.file.Path]] = {
    graft.table.Fixtures.table("quickstart_trips_table/mor/avro/v8_trips_8i3u1d.zip", "v8_trips_8i3u1d")
      .map { base =>
        val dir = Paths.get(base, ".hoodie", "metadata", "files")
        Files.list(dir).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".hfile")).toSeq.sortBy(_.toString)
      }
  }

  test("parses trailer, iterates records, exposes schema") {
    assume(fixtureFiles.exists(_.nonEmpty))
    for (f <- fixtureFiles.get) {
      val r = new HFileReader(Files.readAllBytes(f))
      assert(r.trailer.majorVersion == 3)
      // Hudi writes its MDT HFiles GZIP-compressed — the codec path is
      // genuinely exercised, not just the NONE fast path
      assert(r.trailer.compressionCodec == 1)
      val recs = r.records.toVector
      assert(recs.size == r.numEntries)
      // keys come back in sorted order
      assert(recs.map(_.key) == recs.map(_.key).sorted)
      assert(r.avroSchemaJson.exists(_.contains("HoodieMetadataRecord")))
    }
  }

  test("files partition holds __all_partitions__ plus the 3 city partitions") {
    assume(fixtureFiles.exists(_.nonEmpty))
    // the LATEST files-partition base file carries the full state
    val latest = fixtureFiles.get.last
    val r = new HFileReader(Files.readAllBytes(latest))
    val keys = r.records.map(_.key).toSet
    assert(keys.contains("__all_partitions__"))
    assert(Set("city=chennai", "city=san_francisco", "city=sao_paulo").subsetOf(keys))
  }

  test("point lookup and prefix scan agree with full iteration") {
    assume(fixtureFiles.exists(_.nonEmpty))
    val r = new HFileReader(Files.readAllBytes(fixtureFiles.get.last))
    val all = r.records.toVector
    for (rec <- all) {
      val found = r.lookup(Seq(rec.key))
      assert(found.get(rec.key).exists(_.value.sameElements(rec.value)))
    }
    assert(r.lookup(Seq("zzz-no-such-key")).isEmpty)
    val cityRecs = r.recordsByPrefix("city=")
    assert(cityRecs.map(_.key).toSet == all.map(_.key).filter(_.startsWith("city=")).toSet)
  }

  test("record_index HFiles (multi-file partition) parse too") {
    val files = graft.table.Fixtures
      .table("quickstart_trips_table/mor/avro/v8_trips_8i3u1d.zip", "v8_trips_8i3u1d")
      .map { base =>
        val dir = Paths.get(base, ".hoodie", "metadata", "record_index")
        if (Files.isDirectory(dir))
          Files.list(dir).iterator().asScala
            .filter(_.getFileName.toString.endsWith(".hfile")).toSeq
        else Seq.empty
      }
    assume(files.exists(_.nonEmpty))
    val total = files.get.map(f => new HFileReader(Files.readAllBytes(f)).records.size).sum
    assert(total > 0)
  }
}
