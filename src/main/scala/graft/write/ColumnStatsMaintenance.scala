package graft.write

import graft.table.MetadataTable
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Metadata-table `column_stats`-partition maintenance for the write
  * path: each commit appends one HFile log block of
  * `HoodieMetadataColumnStats` records — EXACT per-(file, column)
  * min/max/valueCount/nullCount computed from the staged data itself
  * (one aggregation over the staging scan the writer already runs), so
  * the index keeps pruning AND answering (tight bounds) over
  * connector-written files with zero footer reads.
  *
  * Records are encoded against the partition's OWN base-HFile schema
  * (read once, driver-side): [[graft.table.ColumnStatsIndex]] decodes
  * log overlays with the base's embedded schema, so a real-Hudi MDT
  * (full HoodieMetadata.avsc) and this repo's fixture subset both
  * round-trip — and a base schema this encoder cannot satisfy (an
  * unknown non-nullable field) refuses loudly instead of appending
  * bytes the reader would mis-decode.
  *
  * Scale shape: driver-side metadata — entries are one per
  * (written file × eligible column), bounded by file count, never rows;
  * the stats themselves ride the staging pass. Coverage is deliberately
  * partial (long/date/string columns; base files only): every index
  * tier keys by planned file + column and falls open on a gap, so a
  * skipped column costs a footer read, never a wrong answer.
  */
object ColumnStatsMaintenance {

  final case class FileColStats(
      partition: String,
      fileName: String,
      column: String,
      wrapper: String, // LongWrapper | DateWrapper | StringWrapper
      min: Any,
      max: Any,
      valueCount: Long,
      nullCount: Long)

  def append(
      dataTableBase: String,
      hadoopConf: Configuration,
      instant: String,
      stats: Seq[FileColStats]): Unit = {
    if (stats.isEmpty) return
    val (_, slices) = MetadataTable.openPartition(
      dataTableBase, graft.table.ColumnStatsIndex.PartitionName, hadoopConf)
    val baseFile = slices.headOption.flatMap(_.baseFile).getOrElse(
      throw new IllegalStateException("column_stats partition has no base HFile"))
    val fs = new Path(baseFile.path).getFileSystem(hadoopConf)
    val baseReader = new graft.hfile.HFileReader(
      graft.util.ReadFully(fs, new Path(baseFile.path)))
    val schema = new org.apache.avro.Schema.Parser().parse(
      baseReader.avroSchemaJson.getOrElse(throw new IllegalStateException(
        "column_stats base HFile carries no avro schema")))

    // the ColumnStatsMetadata branch + the fields this encoder sets; any
    // OTHER non-nullable field would make GenericDatumWriter emit
    // garbage-or-throw — refuse up front
    val csField = Option(schema.getField("ColumnStatsMetadata")).getOrElse(
      throw new UnsupportedOperationException(
        "column_stats schema lacks ColumnStatsMetadata — not maintainable"))
    val csSchema = csField.schema().getTypes.get(1)
    val known = Set("fileName", "columnName", "minValue", "maxValue",
      "valueCount", "nullCount", "isDeleted", "isTightBound")
    csSchema.getFields.forEach { f =>
      val nullable = f.schema().getType == org.apache.avro.Schema.Type.UNION &&
        f.schema().getTypes.stream().anyMatch(_.getType == org.apache.avro.Schema.Type.NULL)
      if (!known.contains(f.name) && !nullable)
        throw new UnsupportedOperationException(
          s"column_stats schema field '${f.name}' is non-nullable and unknown to this " +
            "writer — refusing to append records the reader would mis-decode")
    }
    val records = stats
      .map(s => s"${s.column}//${s.partition}//${s.fileName}" -> encode(schema, csSchema, s))
      .sortBy(_._1)
    MdtMaintenance.appendBlockTo(dataTableBase, hadoopConf, instant, records,
      graft.table.ColumnStatsIndex.PartitionName, schema)
  }

  private def encode(
      schema: org.apache.avro.Schema,
      csSchema: org.apache.avro.Schema,
      s: FileColStats): Array[Byte] = {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import scala.jdk.CollectionConverters._
    val wrapSchema = csSchema.getField("minValue").schema().getTypes.asScala
      .find(_.getName == s.wrapper).getOrElse(
        throw new UnsupportedOperationException(
          s"column_stats schema has no ${s.wrapper} branch — skipping would be the " +
            "caller's job; refusing to mis-encode"))
    def wrap(v: Any): GenericData.Record = {
      val w = new GenericData.Record(wrapSchema)
      w.put("value", v.asInstanceOf[AnyRef])
      w
    }
    val rec = new GenericData.Record(schema)
    rec.put("key", s"${s.column}//${s.partition}//${s.fileName}")
    rec.put("type", 3)
    schema.getFields.forEach { f =>
      if (rec.get(f.name) == null && f.name != "key" && f.name != "type" &&
        f.name != "ColumnStatsMetadata") rec.put(f.name, null)
    }
    val cs = new GenericData.Record(csSchema)
    cs.put("fileName", s.fileName)
    cs.put("columnName", s.column)
    cs.put("minValue", wrap(s.min))
    cs.put("maxValue", wrap(s.max))
    cs.put("valueCount", s.valueCount)
    cs.put("nullCount", s.nullCount)
    cs.put("isDeleted", false)
    if (csSchema.getField("isTightBound") != null) cs.put("isTightBound", true)
    rec.put("ColumnStatsMetadata", cs)
    val out = new java.io.ByteArrayOutputStream()
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }
}
