package graft.table

import graft.core.HoodieConfig
import graft.hfile.HFileReader
import graft.log.{InstantRange, LogFileParser, LogFormat}
import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import scala.collection.mutable

/** A decoded `record_index`-partition entry: record key → the file group
  * holding the record (reference records.rs:118 declares RecordIndex = 5
  * but never decodes it — this is a beyond-reference read surface; the
  * record model is Apache Hudi's public HoodieMetadata.avsc
  * `HoodieRecordIndexInfo`).
  */
final case class RecordIndexEntry(
    key: String,
    partitionPath: String,
    fileId: String,
    instantTime: Long
)

/** A [[RecordIndex.lookup]] result: the entries found plus `asOf`, the
  * MDT commit the index was read at. Locations are the LATEST known ones
  * — a caller planning reads as of an earlier time must check that no
  * relocation (replacecommit) or delete happened after its as-of point
  * and before `asOf`, or fall back to a scan plan (see
  * [[AggMaintenance.maintainCountSumIndexed]] for the full gate).
  */
final case class RecordIndexLookup(
    asOf: String,
    entries: Map[String, RecordIndexEntry]
)

/** Point lookups against the metadata table's `record_index` partition.
  *
  * The index maps every record key to its (partition, fileId) location,
  * so a reader that needs the pre-images of a bounded key set (IVM
  * maintenance, point queries) can plan ONLY the file groups those keys
  * live in instead of scanning the whole table — the 100 TB enabler for
  * [[AggMaintenance]]: the pre-image fetch becomes
  * O(batch keys × log(index)) driver-side planning plus a scan of just
  * the touched file groups.
  *
  * Lookups use [[HFileReader.lookup]] (floor-block binary search per
  * key) against each index file group's base HFile, then overlay any
  * HFile log blocks in commit order (newer wins; an empty value is a
  * tombstone). Keys hash across index file groups near-disjointly, so
  * probing every group per key stays O(groups) block reads worst-case.
  */
object RecordIndex {

  val PartitionName = "record_index"

  /** The data table advertises the partition via
    * `hoodie.table.metadata.partitions` (same config surface the
    * reference's get_metadata_table_partitions reads, table/mod.rs:351).
    */
  def isAvailable(config: HoodieConfig): Boolean =
    config.getOrElse("hoodie.table.metadata.partitions", "")
      .split(",").map(_.trim).contains(PartitionName)

  /** Look up `keys` in the record index at `<dataTableBase>/.hoodie/
    * metadata/record_index`, read as of the MDT's latest completed
    * commit (returned as [[RecordIndexLookup.asOf]] so callers can gate
    * on index freshness). `entries` holds only the keys found;
    * tombstoned keys are absent. Throws on structural problems — an
    * advertised-but-unreadable index (empty MDT timeline, missing slice,
    * schema-less HFile) must surface, never read as "no pre-images";
    * callers catch and fall back to a scan-based plan.
    */
  def lookup(
      dataTableBase: String,
      keys: Seq[String],
      hadoopConf: Configuration
  ): RecordIndexLookup = {
    val (latest, slices) = MetadataTable.openPartition(dataTableBase, PartitionName, hadoopConf)
    if (keys.isEmpty) return RecordIndexLookup(latest, Map.empty)

    def readFully(p: Path): Array[Byte] = graft.util.ReadFully(p, hadoopConf)

    val out = mutable.Map.empty[String, Option[RecordIndexEntry]]
    val range = InstantRange.upTo(latest)
    for (slice <- slices) {
      val baseFile = slice.baseFile.getOrElse(
        throw new IllegalStateException(s"$PartitionName slice lacks a base HFile: $slice"))
      val baseReader = new HFileReader(readFully(new Path(baseFile.path)))
      val schema = new AvroSchema.Parser().parse(baseReader.avroSchemaJson.getOrElse(
        throw new IllegalStateException("record-index base HFile carries no avro schema")))
      // one datum reader + decoder pair reused across the whole batch (a
      // per-record GenericDatumReader is pure allocation overhead)
      val datumReader = new GenericDatumReader[GenericRecord](schema)
      for ((k, rec) <- baseReader.lookup(keys))
        out(k) = decode(k, rec.value, rec.isDeleted, datumReader)
      // log overlay in commit order: last writer wins per key
      val wanted = keys.toSet
      for (lf <- slice.logFiles.sortBy(_.orderingKey)) {
        val blocks = LogFileParser.applyRollbacks(
          LogFileParser.parse(readFully(new Path(lf.path)), range))
        for (b <- blocks if b.blockType == LogFormat.HfileDataBlock && b.rawContent.nonEmpty) {
          val logReader = new HFileReader(b.rawContent)
          for (rec <- logReader.records if wanted.contains(rec.key))
            out(rec.key) = decode(rec.key, rec.value, rec.isDeleted, datumReader)
        }
      }
    }
    RecordIndexLookup(latest, out.collect { case (k, Some(e)) => k -> e }.toMap)
  }

  /** Decode one HoodieMetadataRecord's `recordIndexMetadata` branch.
    * fileIdEncoding 0 reconstructs the id from the UUID high/low bits
    * plus `-fileIndex`; encoding 1 carries the raw string (Hudi's
    * HoodieRecordGlobalLocation encoding, public HoodieMetadata.avsc).
    */
  private def decode(
      key: String, value: Array[Byte], deleted: Boolean,
      reader: GenericDatumReader[GenericRecord]
  ): Option[RecordIndexEntry] = {
    if (deleted || value.isEmpty) return None
    val rec = reader.read(null, DecoderFactory.get().binaryDecoder(value, null))
    Option(rec.get("recordIndexMetadata")).collect { case ri: GenericRecord =>
      def str(f: String): String = Option(ri.get(f)).map(_.toString).getOrElse("")
      def lng(f: String): Long = ri.get(f) match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case _ => 0L
      }
      val encoding = lng("fileIdEncoding").toInt
      val fileId =
        if (encoding == 1) str("fileId")
        else {
          val uuid = new java.util.UUID(lng("fileIdHighBits"), lng("fileIdLowBits")).toString
          val idx = lng("fileIndex")
          if (idx < 0) uuid else s"$uuid-$idx"
        }
      val partition0 = str("partitionName")
      val partition = if (partition0 == FilesPartitionRecord.NonPartitionedName) "" else partition0
      RecordIndexEntry(key, partition, fileId, lng("instantTime"))
    }
  }
}
