package graft.table

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.conf.Configuration

/** S11/M7 against the reference's real v8 metadata table, asserting the
  * same expectations as the reference's own
  * hudi_table_read_metadata_table_files_partition test
  * (metadata/table/mod.rs:288-330).
  */
class MetadataTableSpec extends AnyFunSuite {

  private lazy val tablePath =
    Fixtures.table("quickstart_trips_table/mor/avro/v8_trips_8i3u1d.zip", "v8_trips_8i3u1d")

  test("files partition merges base + log HFiles into 4 records") {
    assume(tablePath.isDefined)
    val records = MetadataTable.filesPartitionRecords(tablePath.get, new Configuration())
    assert(records.size == 4)
    val all = records(FilesPartitionRecord.AllPartitionsKey)
    assert(all.isAllPartitions)
    assert(all.partitionNames.toSet ==
      Set("city=chennai", "city=san_francisco", "city=sao_paulo"))
    val chennai = records("city=chennai")
    assert(chennai.recordType == FilesPartitionRecord.TypeFiles)
    assert(chennai.activeFiles.keySet == Set(
      "6e1d5cc4-c487-487d-abbe-fe9b30b1c0cc-0_2-986-2794_20251220210108078.parquet",
      "6e1d5cc4-c487-487d-abbe-fe9b30b1c0cc-0_0-1112-3190_20251220210129235.parquet",
      ".6e1d5cc4-c487-487d-abbe-fe9b30b1c0cc-0_20251220210127080.log.1_0-1072-3078",
      ".6e1d5cc4-c487-487d-abbe-fe9b30b1c0cc-0_20251220210128625.log.1_0-1097-3150"))
    assert(chennai.totalSize > 0)
  }

  test("merge semantics: tombstones cancel, re-adds clear, max size wins") {
    def rec(files: (String, (Long, Boolean))*) =
      FilesPartitionRecord("p", FilesPartitionRecord.TypeFiles, files.toMap)
    // deletion cancels existing
    assert(MetadataTable.mergeRecords(
      rec("a" -> ((5L, false))), rec("a" -> ((0L, true)))).files.isEmpty)
    // double tombstone keeps newer
    assert(MetadataTable.mergeRecords(
      rec("a" -> ((1L, true))), rec("a" -> ((2L, true)))).files == Map("a" -> ((2L, true))))
    // re-add keeps max size, not deleted
    assert(MetadataTable.mergeRecords(
      rec("a" -> ((9L, false))), rec("a" -> ((4L, false)))).files == Map("a" -> ((9L, false))))
    // new entries pass through
    assert(MetadataTable.mergeRecords(
      rec(), rec("b" -> ((3L, false)))).files == Map("b" -> ((3L, false))))
  }

  test("MDT-served fs-view equals storage-listing fs-view (S11 differential)") {
    assume(tablePath.isDefined)
    import graft.core.{HoodieConfig, Timeline}
    import graft.fs.FsView
    val conf = new Configuration()
    val stored = HoodieConfig.load(tablePath.get, conf)
    assert(MetadataTable.isEnabled(stored, tablePath.get))
    val viaMdt = new FsView(tablePath.get, stored,
      new Timeline(tablePath.get, stored, conf), conf)
    // force the listing path by disabling metadata
    val noMdt = HoodieConfig(stored.props +
      ("hoodie.table.metadata.partitions" -> "") + ("hoodie.metadata.enable" -> "false"))
    val viaListing = new FsView(tablePath.get, noMdt,
      new Timeline(tablePath.get, noMdt, conf), conf)
    assert(viaMdt.partitionPaths.sorted == viaListing.partitionPaths.sorted)
    val ts = new Timeline(tablePath.get, stored, conf).latestCommitTimestamp.get
    def sliceKey(v: FsView) = v.slicesAsOf(ts)
      .map(s => (s.partitionPath, s.baseFile.get.path, s.logFiles.map(_.path).sorted))
      .sortBy(_.toString)
    assert(sliceKey(viaMdt) == sliceKey(viaListing))
  }

  test("enablement rules (metadata/table/mod.rs:80-108)") {
    import graft.core.HoodieConfig
    val v8 = HoodieConfig(Map("hoodie.table.version" -> "8",
      "hoodie.table.metadata.partitions" -> "column_stats,files"))
    assert(MetadataTable.isEnabled(v8, "/t"))
    val v6 = HoodieConfig(Map("hoodie.table.version" -> "6",
      "hoodie.table.metadata.partitions" -> "files"))
    assert(!MetadataTable.isEnabled(v6, "/t"))
    val noFiles = HoodieConfig(Map("hoodie.table.version" -> "8",
      "hoodie.table.metadata.partitions" -> "column_stats"))
    assert(!MetadataTable.isEnabled(noFiles, "/t"))
    val explicit = HoodieConfig(Map("hoodie.table.version" -> "8",
      "hoodie.metadata.enable" -> "true"))
    assert(MetadataTable.isEnabled(explicit, "/t"))
    assert(!MetadataTable.isEnabled(v8, "/t/.hoodie/metadata"))
  }
}
