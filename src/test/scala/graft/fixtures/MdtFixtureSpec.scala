package graft.fixtures

import graft.SparkTestBase
import graft.core.{HoodieConfig, Timeline}
import graft.fs.FsView
import graft.table.{FilesPartitionRecord, HudiTable, MetadataTable}

/** End-to-end checks on the built v8 + metadata-table fixture: the MDT's
  * HFile decodes to the expected listing, the fs-view actually serves it
  * (the planted orphan file proves the plan did NOT come from a storage
  * listing), and the snapshot matches the source table.
  */
class MdtFixtureSpec extends SparkTestBase {

  private lazy val path: String = {
    HudiFixtureBuilder.ensure(spark, sfDir)
    HudiFixtureBuilder.mdtPath(sfDir)
  }

  private lazy val conf = spark.sessionState.newHadoopConf()

  test("files partition decodes: __all_partitions__ + one record per partition") {
    val records = MetadataTable.filesPartitionRecords(path, conf)
    val all = records(FilesPartitionRecord.AllPartitionsKey)
    assert(all.isAllPartitions)
    val parts = all.partitionNames
    assert(parts.nonEmpty && records.size == parts.size + 1)
    for (p <- parts) {
      val rec = records(p)
      assert(rec.recordType == FilesPartitionRecord.TypeFiles)
      assert(rec.activeFiles.size == 1 && rec.totalSize > 0)
    }
  }

  test("fs-view serves the MDT listing: orphan base file is not planned") {
    val stored = HoodieConfig.load(path, conf)
    assert(MetadataTable.isEnabled(stored, path))
    val viaMdt = new FsView(path, stored, new Timeline(path, stored, conf), conf)
    val ts = new Timeline(path, stored, conf).latestCommitTimestamp.get
    val mdtFiles = viaMdt.slicesAsOf(ts).map(s => new org.apache.hadoop.fs.Path(s.baseFile.get.path).getName)
    assert(!mdtFiles.exists(_.contains("000000000099")), "orphan must be invisible via MDT")
    // the raw storage listing DOES see the orphan — proving the two paths
    // genuinely diverge on this fixture and the MDT one was used above
    val noMdt = HoodieConfig(stored.props +
      ("hoodie.table.metadata.partitions" -> "") + ("hoodie.metadata.enable" -> "false"))
    val viaListing = new FsView(path, noMdt, new Timeline(path, noMdt, conf), conf)
    val listedFiles = viaListing.slicesAsOf(ts).map(s => new org.apache.hadoop.fs.Path(s.baseFile.get.path).getName)
    assert(listedFiles.exists(_.contains("000000000099")), "tripwire orphan missing from storage")
    assert(listedFiles.size == mdtFiles.size + 1)
  }

  test("snapshot through the MDT listing matches the source table") {
    val rows = HudiTable(spark, path).snapshot()
      .select("n_nationkey", "n_name", "n_regionkey").collect()
    val expected = spark.read.parquet(s"$sfDir/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey").collect()
    assert(rows.toSet == expected.toSet)
    assert(rows.length == expected.length) // orphan would duplicate region-0 rows
  }
}
