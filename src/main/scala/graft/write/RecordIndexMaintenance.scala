package graft.write

import graft.table.{FilesPartitionRecord, MetadataTable, RecordIndex}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Metadata-table `record_index`-partition maintenance for the write
  * path: each commit that creates or removes record keys appends ONE
  * HFile log block per touched index file group — new keys as
  * `HoodieRecordIndexInfo` entries (fileIdEncoding=1, raw string fileId:
  * a public Hudi encoding this repo's [[RecordIndex]] reader decodes),
  * deleted keys as empty-value tombstones — followed by one deltacommit
  * on the MDT's own timeline at the DATA instant (completing BEFORE the
  * data commit, preserving the `mdtAt >= dataAt` freshness gate every
  * index consumer relies on).
  *
  * Scale shape: the volume is O(created + deleted KEYS) — row scale, so
  * nothing passes through the driver: key locations repartition by
  * Hudi's key-hash group mapping ([[RecordIndex.fileGroupIndex]], the
  * same 31-poly hash reads probe by), one executor task writes one index
  * group's log block (records sorted — the HFile key invariant), and the
  * driver only completes the timeline. Requires a provably hash-aligned
  * slice set, exactly like the distributed read probe — a gap would
  * shrink the modulus and misroute every subsequent lookup, so
  * misalignment throws rather than corrupting the index.
  */
object RecordIndexMaintenance {

  /** Public Apache Hudi HoodieMetadata.avsc subset carrying the
    * `recordIndexMetadata` branch — identical to the schema the fixture
    * builder embeds in base HFiles, so [[graft.table.MdtSliceProbe]]'s
    * first-HFile datum reader decodes both layers interchangeably.
    */
  val riAvroSchema: org.apache.avro.Schema =
    new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"HoodieMetadataRecord","fields":[
        |{"name":"key","type":"string"},
        |{"name":"type","type":"int"},
        |{"name":"filesystemMetadata","type":["null",{"type":"map","values":
        |  {"type":"record","name":"HoodieMetadataFileInfo","fields":[
        |    {"name":"size","type":"long"},{"name":"isDeleted","type":"boolean"}]}}]},
        |{"name":"recordIndexMetadata","type":["null",
        |  {"type":"record","name":"HoodieRecordIndexInfo","fields":[
        |    {"name":"partitionName","type":["null","string"],"default":null},
        |    {"name":"fileIdHighBits","type":["null","long"],"default":null},
        |    {"name":"fileIdLowBits","type":["null","long"],"default":null},
        |    {"name":"fileIndex","type":["null","int"],"default":null},
        |    {"name":"fileId","type":["null","string"],"default":null},
        |    {"name":"instantTime","type":["null","long"],"default":null},
        |    {"name":"fileIdEncoding","type":["null","int"],"default":null}]}]}
        |]}""".stripMargin.replaceAll("\n", ""))

  /** One serialized HoodieMetadataRecord naming `key`'s location. */
  def entryBytes(key: String, partition: String, fid: String, instantTime: Long): Array[Byte] = {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val riSchema = riAvroSchema.getField("recordIndexMetadata").schema().getTypes.get(1)
    val rec = new GenericData.Record(riAvroSchema)
    rec.put("key", key)
    rec.put("type", 5)
    rec.put("filesystemMetadata", null)
    val ri = new GenericData.Record(riSchema)
    ri.put("partitionName",
      if (partition.isEmpty) FilesPartitionRecord.NonPartitionedName else partition)
    ri.put("instantTime", instantTime)
    ri.put("fileId", fid)
    ri.put("fileIdEncoding", 1)
    ri.put("fileIdHighBits", 0L)
    ri.put("fileIdLowBits", 0L)
    ri.put("fileIndex", -1)
    rec.put("recordIndexMetadata", ri)
    val out = new java.io.ByteArrayOutputStream()
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](riAvroSchema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** Append `entries` ((__key, __part, __fid) of keys CREATED by this
    * commit) and `tombstones` ((__key) of keys it removed) to the record
    * index at `instant`, then complete the MDT deltacommit.
    */
  def append(
      spark: SparkSession,
      dataTableBase: String,
      instant: String,
      entries: Option[DataFrame],
      tombstones: Option[DataFrame],
      timelineTimezone: String): Unit = {
    val hadoopConf = spark.sessionState.newHadoopConf()
    val mdtBase = new Path(new Path(dataTableBase, ".hoodie"), "metadata")
    val fs = mdtBase.getFileSystem(hadoopConf)
    val mdtConfig = graft.core.HoodieConfig.load(mdtBase.toString, hadoopConf)

    val (_, slices) = MetadataTable.openPartition(
      dataTableBase, RecordIndex.PartitionName, hadoopConf)
    // hash-aligned group map: ordinal -> (sliceFileId, nameTs, nextVersion)
    val parsed = slices.flatMap(sl => RecordIndex.groupIndexOf(sl.fileId).map(_ -> sl))
    if (parsed.size != slices.size ||
        parsed.map(_._1).sorted != (0 until slices.size))
      throw new IllegalStateException(
        s"record_index slices are not hash-aligned (${slices.map(_.fileId)}); " +
          "appending would misroute keys")
    val v8 = mdtConfig.tableVersion >= 8
    val naming = parsed.map { case (g, sl) =>
      g -> ((sl.fileId,
        if (v8) instant else sl.commitTimestamp,
        sl.logFiles.map(_.version).maxOption.getOrElse(0) + 1))
    }.toMap
    val n = naming.size

    // one row per (key, valueBytes-kind): tombstones carry a null fid
    val frames = entries.map(_.select("__key", "__part", "__fid")).toSeq ++
      tombstones.map(_.select(org.apache.spark.sql.functions.col("__key"),
        org.apache.spark.sql.functions.lit(null).cast("string").as("__part"),
        org.apache.spark.sql.functions.lit(null).cast("string").as("__fid"))).toSeq
    if (frames.isEmpty) return
    val rows = frames.reduce(_ unionByName _)

    val tsMillis = graft.core.Timestamps.timelineToEpochMillis(instant, timelineTimezone)
    val conf = new graft.util.SerializableConf(hadoopConf)
    val bcNaming = spark.sparkContext.broadcast(naming)
    val riDir = new Path(mdtBase, RecordIndex.PartitionName).toString
    val token = "0-0-0"
    val schemaBytes = riAvroSchema.toString.getBytes("UTF-8")

    // executor-side: each task holds exactly one index group's keys
    // (HashPartitioner on the group ordinal is the identity mapping),
    // sorts them (the HFile key invariant) and writes one log block
    val written = rows.rdd
      .map(r => (RecordIndex.fileGroupIndex(r.getString(0), n), r))
      .partitionBy(new org.apache.spark.HashPartitioner(n))
      .mapPartitionsWithIndex { (g, it) =>
        val recs = it.map { case (_, r) =>
          val key = r.getString(0)
          if (r.isNullAt(2)) key -> Array.emptyByteArray
          else key -> entryBytes(key, r.getString(1), r.getString(2), tsMillis)
        }.toVector.sortBy(_._1)
        if (recs.isEmpty) Iterator.empty
        else {
          val (sliceFid, nameTs, version) = bcNaming.value(g)
          val hfileBytes = graft.hfile.HFileWriter.write(
            recs, Map("schema" -> schemaBytes), recordsPerBlock = 64)
          val dir = new Path(riDir)
          val fsx = dir.getFileSystem(conf.value)
          val name = s".${sliceFid}_$nameTs.log.${version}_$token"
          val out = new java.io.DataOutputStream(fsx.create(new Path(dir, name), false))
          try {
            val avro = new org.apache.avro.Schema.Parser()
              .parse(new String(schemaBytes, "UTF-8"))
            graft.log.LogFileWriter.hfileDataBlock(out, instant, avro, hfileBytes)
          } finally out.close()
          Iterator.single(name)
        }
      }.collect()
    if (written.nonEmpty)
      MdtMaintenance.completeDeltacommit(fs, mdtBase, mdtConfig, instant)
  }
}
