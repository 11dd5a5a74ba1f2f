package graft.table

import graft.SparkTestBase
import java.nio.file.{Files, Paths}

/** The base-file-format open contract (SURVEY.md §2 S7): PARQUET and
  * LANCE execute (the reference reads Lance via base_file/lance.rs; this
  * engine via graft.lance.LanceFormat — LanceTableSpec covers the reads);
  * HFile as a DATA-table format is rejected the same way the reference's
  * base_file/reader.rs:160-163 rejects it (the metadata table keeps its
  * dedicated HFile path, exercised by MetadataTableSpec).
  */
class BaseFileFormatContractSpec extends SparkTestBase {

  private def tableWithFormat(format: String): String = {
    val base = Files.createTempDirectory(s"graft_fmt_${format.toLowerCase}_")
    Files.createDirectories(Paths.get(base.toString, ".hoodie"))
    Files.write(
      Paths.get(base.toString, ".hoodie", "hoodie.properties"),
      s"""hoodie.table.name=fmt_contract
         |hoodie.table.type=COPY_ON_WRITE
         |hoodie.table.version=9
         |hoodie.table.base.file.format=$format
         |""".stripMargin.getBytes("UTF-8"))
    base.toString
  }

  test("a LANCE table opens (S7 implemented) and reports isLance") {
    val t = HudiTable(spark, tableWithFormat("LANCE"))
    assert(t.isLance)
  }

  test("HFile as a data-table format is rejected like the reference") {
    val e = intercept[UnsupportedOperationException] {
      HudiTable(spark, tableWithFormat("HFILE"))
    }
    assert(e.getMessage.contains("metadata-table"))
  }

  test("an unknown format names itself in the error") {
    val e = intercept[IllegalArgumentException] {
      HudiTable(spark, tableWithFormat("ORC"))
    }
    assert(e.getMessage.contains("ORC"))
  }

  test("PARQUET tables still open (the gate is format-selective)") {
    // any committed fixture table proves the open path is unaffected
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val t = HudiTable(spark, graft.fixtures.HudiFixtureBuilder.cowPath(sfDir))
    assert(t.config.baseFileFormat.equalsIgnoreCase("PARQUET"))
    assert(!t.isLance)
  }
}
