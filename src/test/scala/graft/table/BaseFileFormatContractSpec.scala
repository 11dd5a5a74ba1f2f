package graft.table

import graft.SparkTestBase
import java.nio.file.{Files, Paths}

/** The base-file-format open contract (SURVEY.md §2 S7): PARQUET executes;
  * LANCE — which the reference reads via base_file/lance.rs but no
  * Spark-compatible reader exists for — fails AT OPEN with an actionable
  * message instead of a deep parquet decode error or a wrong answer; HFile
  * as a DATA-table format is rejected the same way the reference's
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

  test("a v9 Lance table fails at open with a clear, actionable error") {
    val e = intercept[UnsupportedOperationException] {
      HudiTable(spark, tableWithFormat("LANCE"))
    }
    assert(e.getMessage.contains("Lance"))
    assert(e.getMessage.contains("unsupported"))
    assert(e.getMessage.contains("hoodie.table.base.file.format"))
  }

  test("the Lance contract holds through the DSv2 path too") {
    val e = intercept[UnsupportedOperationException] {
      spark.read.format("hudi-graft").load(tableWithFormat("lance")).collect()
    }
    assert(e.getMessage.contains("Lance"))
    // the message names engines that CAN read it — an actionable error,
    // not a dead end
    assert(e.getMessage.contains("hudi-rs"))
  }

  test("the Lance contract holds through the DSv2 CATALOG time-travel path") {
    spark.conf.set("spark.sql.catalog.lance_probe",
      classOf[graft.sources.GraftCatalog].getName)
    val path = tableWithFormat("LANCE")
    val e = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM lance_probe.`$path` FOR TIMESTAMP AS OF '2024-01-01 00:00:00'"
      ).collect()
    }
    // the open-contract error surfaces through catalog resolution (Spark
    // may wrap it; the actionable text must survive)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("Lance") && m.contains("unsupported")),
      s"catalog path lost the Lance open error: ${messages(e)}")
  }

  test("the REAL v9 Lance fixture fails at open BEFORE any data IO") {
    val lance = Fixtures.table(
      "quickstart_trips_table/cow/v9_trips_lance.zip", "v9_trips_lance")
    assume(lance.isDefined)
    val e = intercept[UnsupportedOperationException] {
      HudiTable(spark, lance.get)
    }
    assert(e.getMessage.contains("Lance"))
    assert(e.getMessage.contains("hudi-rs"))
    // failing at OPEN (config check) proves no data file was touched: the
    // exception type is the contract's, not a decode/IO error from a
    // .lance byte stream
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
  }
}
