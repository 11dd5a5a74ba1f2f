package graft.table

import graft.core.{HoodieConfig, MetaField, Timeline, Timestamps}
import graft.fs.{FileSlice, FsView, PartitionFilter, PartitionPruner}
import graft.log.{AvroConvert, InstantRange}
import graft.util.SerializableConf
import org.apache.avro.{Schema => AvroSchema}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A Hudi table opened for reading — the Spark-native analog of the
  * reference's `Table` (crates/core/src/table/mod.rs:130-143).
  *
  * Steps 1-3 of the read lifecycle (configs, timeline, slice planning) run
  * on the driver over metadata only; execution is Spark's vectorized
  * parquet scan over the planned base files plus a distributed log decode,
  * so data volume scales with executors, never with the driver.
  */
final class HudiTable(
    val spark: SparkSession,
    val basePath: String,
    readOptions: Map[String, String] = Map.empty
) {

  val hadoopConf = spark.sessionState.newHadoopConf()

  /** Table configs from hoodie.properties, SUPPLEMENTED (never overridden)
    * by call-scoped read options — e.g. the keygen settings Hudi writers
    * don't persist (the reference's OptionResolver merge).
    */
  val config: HoodieConfig = {
    val stored = HoodieConfig.load(basePath, hadoopConf)
    val extra = readOptions.filter { case (k, _) =>
      k.startsWith("hoodie.") && !stored.props.contains(k)
    }
    if (extra.isEmpty) stored else HoodieConfig(stored.props ++ extra)
  }
  // Base-file format contract, checked at open so a wrong format fails
  // here instead of deep in a decode (the reference dispatches per format
  // in base_file/reader.rs:152-167; its Lance reader is
  // base_file/lance.rs — here graft.lance.LanceFormat, an independent
  // implementation of the subset Hudi writers emit). HFile data files
  // belong to the metadata table's dedicated reader path, as in the
  // reference.
  config.baseFileFormat.toUpperCase match {
    case "PARQUET" | "LANCE" => ()
    case "HFILE" => throw new UnsupportedOperationException(
      s"table $basePath declares HFile base files — HFile is only supported " +
        "through the metadata-table reader path, not as a data-table format")
    case other => throw new IllegalArgumentException(
      s"table $basePath declares unknown base file format '$other'")
  }

  /** True when data files are Lance (S7): the scan routes base reads
    * through [[graft.lance.LanceFormat]] and every parquet-footer-probing
    * optimization (footer min/max pruning, aggregate pushdown from
    * footers, per-file widen probing, columnar batches) stands down.
    * With the format key ABSENT, falls back to the sampled base file's
    * extension — the reference's behavior for tables whose writer didn't
    * persist the key (base_file/reader.rs extension dispatch, pinned by
    * its v9_lance_nonpartitioned_cow_read_uses_extension_fallback test).
    */
  lazy val isLance: Boolean =
    config.baseFileFormat.equalsIgnoreCase("LANCE") ||
      (config.get(graft.core.HoodieConfig.BaseFileFormat).isEmpty &&
        sampledBasePath.exists(_.endsWith(".lance")))

  /** One arbitrary latest base file — the schema-probe / format-fallback
    * sample.
    */
  private lazy val sampledBasePath: Option[String] =
    fsView.partitionPaths.iterator
      .flatMap(p => fsView.fileGroups(p))
      .flatMap(_.slices.values.lastOption)
      .flatMap(_.baseFile.map(_.path))
      .take(1).toList.headOption

  val timeline: Timeline = new Timeline(basePath, config, hadoopConf)
  val fsView: FsView = new FsView(basePath, config, timeline, hadoopConf)

  /** Data-skipping ranges from the MDT `column_stats` partition when the
    * table advertises it (fileName → column → (min, max)), loaded once
    * per table generation (the open-table cache keeps the instance while
    * the timeline is unchanged). Empty — footer fallback at the pruner —
    * when absent or unreadable.
    */
  private lazy val columnStatsLookup: Option[ColumnStatsLookup] =
    if (!ColumnStatsIndex.isAvailable(config)) None
    else
      try Some(ColumnStatsIndex.load(basePath, hadoopConf))
      catch { case scala.util.control.NonFatal(_) => None }

  lazy val columnStatsForPruning: Map[String, Map[String, (Comparable[Any], Comparable[Any])]] =
    columnStatsLookup.map(_.pruningStats).getOrElse(Map.empty)

  /** Tight-bound index ranges only — exact extremes a MIN/MAX pushdown
    * may serve as ANSWERS (loose bounds prune but never answer).
    */
  lazy val columnStatsTight: Map[String, Map[String, (Comparable[Any], Comparable[Any])]] =
    columnStatsLookup.map(_.tightStats).getOrElse(Map.empty)

  /** Exact per-file row counts from the index (fileName → rows) — lets
    * `COUNT(*)` pushdown answer from the ONE MDT read instead of a
    * footer fetch per planned file (see [[ColumnStatsLookup.rowCounts]]
    * for the exactness argument). Empty when the index is absent.
    */
  lazy val columnStatsRowCounts: Map[String, Long] =
    columnStatsLookup.map(_.rowCounts).getOrElse(Map.empty)

  /** fileName → zero-null-proven columns from the index — `IS NULL`
    * file pruning without footer reads (see
    * [[ColumnStatsLookup.zeroNullCols]]).
    */
  lazy val columnStatsZeroNulls: Map[String, Set[String]] =
    columnStatsLookup.map(_.zeroNullCols).getOrElse(Map.empty)

  /** fileName → column → nullCount from the index — `COUNT(col)`
    * pushdown (rows − nulls) without footer reads.
    */
  lazy val columnStatsNullCounts: Map[String, Map[String, Long]] =
    columnStatsLookup.map(_.nullCounts).getOrElse(Map.empty)

  /** Partition-level ranges from the MDT `partition_stats` partition
    * (partitionPath → column → (min, max)) when advertised — feeds
    * [[graft.fs.StatsPartitionPruner]] so data-column predicates prune
    * partitions before listing. Empty (no stats pruning) when absent or
    * unreadable.
    */
  lazy val partitionStatsForPruning: Map[String, Map[String, (Comparable[Any], Comparable[Any])]] =
    if (!PartitionStatsIndex.isAvailable(config)) Map.empty
    else
      try PartitionStatsIndex.load(basePath, hadoopConf)
      catch { case scala.util.control.NonFatal(_) => Map.empty }

  private def serConf = new SerializableConf(hadoopConf)

  def tableType: String = config.tableType
  def isMor: Boolean = config.isMor

  /** Resolved read schema, following the reference's resolution order
    * (schema/resolver.rs:41-47): (1) the latest commit metadata's
    * `extraMetadata.schema` Avro string — authoritative on schema-evolved
    * tables where a sampled file group may predate a column add; (2) the
    * newest base file's parquet footer; (3) `hoodie.table.create.schema`.
    * Avro schemas never carry the `_hoodie_*` meta fields (resolver.rs
    * note), so they're prepended when the table populates them.
    */
  private lazy val resolvedSchemas: (StructType, Seq[String]) = {
    // unconditional like the reference (resolver.rs:50-53): no-metafields
    // tables still expose the columns, null-valued
    def prependMeta(data: StructType): StructType = {
      val meta = MetaField.all.filterNot(data.fieldNames.contains)
        .map(StructField(_, StringType, nullable = true))
      StructType(meta ++ data.fields)
    }
    val fromCommit: Option[StructType] = timeline.latestSchemaAvro
      .map(json => prependMeta(AvroConvert.toStructType(new AvroSchema.Parser().parse(json))))
    // prependMeta here too (a no-op when the footer physically carries the
    // meta columns): the reference prepends AFTER resolution on every path
    // (resolver.rs resolve_schema), so a no-metafields table exposes the
    // same null-valued meta columns whichever branch fired
    def fromFooter: Option[StructType] = sampledBasePath
      .map(path => prependMeta(
        if (path.endsWith(".lance")) graft.lance.LanceFormat.readSchema(path, hadoopConf)
        else spark.read.parquet(path).schema))
    def fromCreate: StructType = {
      val avroJson = config.get("hoodie.table.create.schema").getOrElse(
        throw new IllegalStateException(s"Cannot resolve schema for empty table $basePath"))
      prependMeta(AvroConvert.toStructType(new AvroSchema.Parser().parse(avroJson)))
    }
    val resolved = fromCommit.orElse(fromFooter).getOrElse(fromCreate)
    // P6: with hoodie.datasource.write.drop.partition.columns=true the
    // partition fields are physically absent from the files — whether or
    // not the logical schema mentions them (the commit-metadata writer
    // schema does, a footer doesn't). Ensure they're in the schema (typed
    // from create.schema when available) and record them as dropped so
    // reads re-inject values from partition paths.
    val base: (StructType, Seq[String]) =
      if (!config.dropsPartitionFields) (resolved, Nil)
      else {
        val missing = config.partitionFields.filterNot(resolved.fieldNames.contains)
        val createTypes: Map[String, org.apache.spark.sql.types.DataType] =
          config.get("hoodie.table.create.schema")
            .map(j => AvroConvert.toStructType(new AvroSchema.Parser().parse(j)))
            .map(st => st.fields.map(f => f.name -> f.dataType).toMap)
            .getOrElse(Map.empty)
        val full = StructType(resolved.fields ++
          missing.map(f => StructField(f, createTypes.getOrElse(f, StringType), nullable = true)))
        (full, config.partitionFields.filter(full.fieldNames.contains))
      }
    base
  }

  /** NUMERIC timestamp-keygen source fields DECLARED string: the real
    * writer's commit schema records the formatted rendering's type while
    * the parquet files may still hold the ORIGINAL numeric column —
    * reading such a file under the resolved schema is a physical-type
    * crash. The real v9_timebasedkeygen_epochmillis bytes are MIXED:
    * two base files carry int64, one carries STRING holding the decimal
    * epoch rendering ("1705367700000"). That string file defines the
    * honest semantics — the column's value is the full-precision epoch
    * rendered in decimal, NOT the hour-bucket partition path (the r9
    * path-injection approach was value-lossy and is gone). int64 files
    * are therefore read PER-FILE with the column as LONG and cast to the
    * same decimal string ([[longWidenPaths]] probes footers to decide).
    * DATE_STRING keygens never qualify — their stored column is already
    * the string the schema declares.
    */
  lazy val longWidenFields: Seq[String] = graft.fs.TimestampKeyGen.fromConfig(config) match {
    case Some(kg) if Set("UNIX_TIMESTAMP", "EPOCHMILLISECONDS",
        "EPOCHMICROSECONDS", "SCALAR").contains(kg.timestampType.toUpperCase) =>
      // ONLY the keygen SOURCE field (the first partition field — the
      // same one fromConfig binds): a second, genuinely-string partition
      // column must not join the probe, or its BINARY footers would veto
      // widening for the numeric source and reintroduce the crash
      config.partitionFields.headOption.toSeq.filter(f =>
        tableSchema.fields.exists(tf => tf.name == f && tf.dataType == StringType) &&
          !droppedPartitionFields.contains(f))
    case _ => Nil
  }

  /** Memoized [[longWidenPaths]] verdicts: base-file paths are immutable
    * (a rewrite creates a new path), so a footer verdict never goes
    * stale — repeat queries and streaming micro-batches on a gated
    * table re-probe only paths they have not seen.
    */
  private val longWidenCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Of `paths`, those whose footer proves EVERY [[longWidenFields]]
    * column physically INT64 — the files the read widens long→string.
    * One parallel footer sweep, planning-time, gated tables only (zero
    * cost elsewhere). Unprobeable or non-INT64 files read normally: a
    * string-physical file is already correct, anything else fails
    * LOUDLY at read rather than silently substituting values.
    */
  def longWidenPaths(paths: Seq[String]): Set[String] =
    if (longWidenFields.isEmpty || paths.isEmpty) Set.empty
    else {
      // memoized per path: base files are immutable (a rewrite gets a new
      // path), so repeat queries / micro-batches probe only unseen paths
      val fresh = paths.filterNot(longWidenCache.containsKey)
      graft.util.Parallel.map(fresh, 16) { path =>
        val verdict: Boolean = try {
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(path), hadoopConf))
          try {
            val msg = reader.getFooter.getFileMetaData.getSchema
            longWidenFields.forall(f => msg.containsField(f) && {
              val t = msg.getType(Seq(f): _*)
              t.isPrimitive && t.asPrimitiveType().getPrimitiveTypeName ==
                org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
            })
          } finally reader.close()
        } catch { case scala.util.control.NonFatal(_) => false }
        longWidenCache.put(path, verdict)
      }
      paths.iterator.filter(p => longWidenCache.get(p) == java.lang.Boolean.TRUE).toSet
    }

  /** Base-file DataFrame read with the per-file long→string widening
    * applied when the table qualifies (one extra union branch; identical
    * plans for every other table).
    */
  private def readBaseDf(schemaToRead: StructType, paths: Seq[String]): DataFrame = {
    val cand = longWidenFields.filter(schemaToRead.fieldNames.contains)
    val widen = if (cand.isEmpty) Set.empty[String] else longWidenPaths(paths)
    if (widen.isEmpty) spark.read.schema(schemaToRead).parquet(paths: _*)
    else {
      val longSchema = StructType(schemaToRead.fields.map(f =>
        if (cand.contains(f.name)) f.copy(dataType = org.apache.spark.sql.types.LongType) else f))
      // LONG → decimal string: the exact rendering the writer's own
      // string-physical files store
      val widened = spark.read.schema(longSchema).parquet(widen.toSeq.sorted: _*)
        .select(schemaToRead.fields.map(f =>
          if (cand.contains(f.name)) col(f.name).cast(org.apache.spark.sql.types.StringType).as(f.name)
          else col(f.name)).toIndexedSeq: _*)
      val rest = paths.filterNot(widen)
      if (rest.isEmpty) widened
      else widened.unionByName(spark.read.schema(schemaToRead).parquet(rest: _*))
    }
  }

  lazy val tableSchema: StructType = resolvedSchemas._1

  /** Partition fields physically absent from the data files (P6). */
  lazy val droppedPartitionFields: Seq[String] = resolvedSchemas._2

  private def orderingField: Option[String] = config.orderingFields.headOption

  private[graft] def prunerFor(filters0: Seq[PartitionFilter]): PartitionPruner = {
    // P3: strict validation — filters naming unknown columns are an error
    // (reference validate_fields_against_schemas, expr/filter.rs:204-222)
    val known = tableSchema.fieldNames.toSet
    val bad = filters0.map(_.field).filterNot(known.contains)
    require(bad.isEmpty, s"Filter fields not in table schema: ${bad.mkString(", ")}")
    // R3: timestamp-keygen tables rewrite source-field filters into
    // partition-path filters (keygen/timestamp_based.rs)
    val filters = graft.fs.TimestampKeyGen.fromConfig(config) match {
      case Some(kg) => filters0.flatMap(kg.transformFilter)
      case None => filters0
    }
    new PartitionPruner(partitionFieldTypes, config.isHiveStylePartitioning,
      config.isPartitionPathUrlencoded, filters,
      // null-aware: IS [NOT] NULL filters prune exactly against the
      // writer's null-partition sentinels, and a sentinel under a typed
      // field no longer voids the rest of the parse
      nullSentinel = Some(config.isPartitionNullSentinel),
      // v4+ bare 'default' is maybe-null (a legacy pre-upgrade null dir
      // or a genuine value) — never exclusion power over null predicates
      ambiguousValue = Some(config.isPartitionAmbiguousValue))
  }

  /** The full planning pruner: path-value pruning (R1) layered with MDT
    * partition-stats pruning over the data-column filters when the index
    * is advertised. ONLY valid for latest-snapshot planning — the index
    * reflects the current table state, so time-travel and bounded
    * incremental reads must use [[prunerFor]] alone.
    */
  private[graft] def statsPrunerFor(
      partitionFilters: Seq[PartitionFilter],
      dataFilters: Seq[PartitionFilter]
  ): graft.fs.PartitionInclude = {
    val base = prunerFor(partitionFilters)
    if (dataFilters.isEmpty || partitionStatsForPruning.isEmpty) base
    else new graft.fs.StatsPartitionPruner(
      base, dataFilters, tableSchema, partitionStatsForPruning)
  }

  /** Time-travel variant of [[statsPrunerFor]]: loads partition stats as
    * of `ts` and applies them ONLY when the MDT view is at least as new
    * as the data instant the read resolves to — MDT commits mirror data
    * commits (plus MDT-internal compactions, which carry the same
    * logical state under a newer timestamp, e.g. the real trips
    * fixture's 30942 compaction above its 30911 data tip), so
    * `mdtAt >= dataAt` means the stats describe exactly the commits the
    * read sees. A LAGGING index (`mdtAt < dataAt`: stats missing a
    * visible commit whose rows could widen the ranges) fails open to
    * path-value pruning alone. `ts` must already be normalized.
    */
  private[graft] def statsPrunerAsOf(
      ts: String,
      partitionFilters: Seq[PartitionFilter],
      dataFilters: Seq[PartitionFilter]
  ): graft.fs.PartitionInclude = {
    val base = prunerFor(partitionFilters)
    if (dataFilters.isEmpty || !PartitionStatsIndex.isAvailable(config)) return base
    try {
      timeline.instantsAsOf(ts).lastOption.map(_.timestamp) match {
        case None => base
        case Some(dataAt) =>
          val lookup = ColumnStatsIndex.load(
            basePath, hadoopConf, PartitionStatsIndex.PartitionName, Some(ts))
          if (lookup.asOf < dataAt) base
          else new graft.fs.StatsPartitionPruner(
            base, dataFilters, tableSchema, lookup.pruningStats)
      }
    } catch { case scala.util.control.NonFatal(_) => base }
  }

  /** Partition field → pruner type name, the single source of truth for
    * every pruning path (driver-side, DSv2 pushdown classification, and
    * runtime/DPP filtering) so a newly supported type can't drift between
    * them.
    */
  private[graft] lazy val partitionFieldTypes: Seq[(String, String)] =
    config.partitionFields.map { f =>
      val tpe = tableSchema.fields.find(_.name == f).map(_.dataType) match {
        case Some(IntegerType | ShortType | ByteType) => "int"
        case Some(LongType) => "long"
        case Some(DoubleType | FloatType) => "double"
        case Some(DateType) => "date"
        case _ => "string"
      }
      f -> tpe
    }

  /** Snapshot read at the latest commit, or time-travel via `asOf` (any
    * format accepted by [[Timestamps.normalize]]). `readOptimized` skips
    * log files (M6). S1/S2 of the inventory.
    */
  def snapshot(
      asOf: Option[String] = None,
      partitionFilters: Seq[PartitionFilter] = Nil,
      readOptimized: Boolean = false
  ): DataFrame = {
    val endOpt = asOf
      .map(Timestamps.normalize(_, config.timelineTimezone))
      .orElse(timeline.latestCommitTimestamp)
    endOpt match {
      case None => LogScan.emptyDf(spark, tableSchema)
      case Some(end) =>
        // The UNFILTERED shapes delegate to the DSv2 relation (r12):
        // its per-slice merge reader — columnar for eligible schemas —
        // merges each file group against its own logs with NO shuffle,
        // where this method's legacy readSlices path union+window+
        // anti-joined the WHOLE table on the record key (a table-wide
        // shuffle that exists only to recover per-group locality the
        // slices already have; measured 1.23s vs 0.48s warm at sf0.1,
        // and at 100 TB the difference between a network-bound and a
        // local merge). Row-for-row equality is pinned by the DSv2
        // row-vs-columnar differential plus the 55 call sites of this
        // method across the suites. Partition-filtered reads keep the
        // legacy path: PartitionFilter is this API's own pre-parsed
        // form, and mapping it back through Catalyst predicates would
        // re-derive what prunerFor consumes directly.
        // readOptions supplement configs Hudi writers do not persist
        // (timestamp-keygen type, ordering field) — the DSv2 path
        // rebuilds its table WITHOUT them, so an optioned handle keeps
        // the legacy path rather than silently dropping semantics.
        // `as.of.timestamp` is pinned to THIS handle's resolved end
        // even for latest-reads: the delegated relation re-opens table
        // state, and without the pin one handle could serve newer data
        // than its own fileSlicesDf/timelineDf report.
        if (partitionFilters.isEmpty && readOptions.isEmpty) {
          var r = spark.read.format("hudi-graft").option("as.of.timestamp", end)
          if (readOptimized) r = r.option("read.optimized", "true")
          r.load(basePath)
        } else {
          val slices0 = fsView.slicesAsOf(end, prunerFor(partitionFilters))
          // RO strips logs; a log-only slice then has nothing to read
          val slices =
            if (readOptimized) slices0.map(_.withoutLogs).filter(_.baseFile.isDefined)
            else slices0
          readSlices(slices, InstantRange.upTo(end), commitRange = None)
        }
    }
  }

  /** Snapshot restricted to the file groups in `groups` (partitionPath →
    * fileIds), the planning primitive behind record-index point reads:
    * callers that know WHICH groups hold their keys (via
    * [[RecordIndex.lookup]]) read just those slices as of `asOf` instead
    * of the whole table. Groups born after `asOf` simply plan no slice.
    */
  private[graft] def snapshotForFileGroups(
      asOf: String,
      groups: Map[String, Set[String]]
  ): DataFrame = {
    val end = Timestamps.normalize(asOf, config.timelineTimezone)
    val slices = fsView.slicesAsOf(end, prunerFor(Nil))
      .filter(sl => groups.get(sl.partitionPath).exists(_.contains(sl.fileId)))
    readSlices(slices, InstantRange.upTo(end), commitRange = None)
  }

  /** Inspection surface (the reference's public `get_file_slices`,
    * table/mod.rs:441): the planned file slices as a DataFrame —
    * partition, file group, slice commit, base-file presence/name and
    * log count — for tooling and ops queries. Driver-side planning only;
    * row count = slice count, never data-sized.
    */
  def fileSlicesDf(asOf: Option[String] = None): DataFrame = {
    import spark.implicits._
    val end = asOf.map(Timestamps.normalize(_, config.timelineTimezone))
      .orElse(timeline.latestCommitTimestamp)
    end.map(ts => fsView.slicesAsOf(ts))
      .getOrElse(Vector.empty)
      .map(sl => (sl.partitionPath, sl.fileId, sl.commitTimestamp,
        sl.baseFile.map(_.fileName).getOrElse(""), sl.logFiles.size))
      .toDF("partition_path", "file_id", "commit_ts", "base_file", "num_logs")
  }

  /** Inspection surface (the reference's `get_timeline`,
    * table/mod.rs:422): completed instants as a DataFrame.
    */
  def timelineDf: DataFrame = {
    import spark.implicits._
    timeline.completedInstants
      .map(i => (i.timestamp, i.action, i.completionTimestamp.getOrElse("")))
      .toDF("commit_ts", "action", "completion_ts")
  }

  /** C3: estimated (rows, bytes) for the latest snapshot — total planned
    * file size with rows extrapolated from one sampled footer
    * (table/mod.rs:902-952; snapshot only, like the reference).
    */
  def tableStats: (Long, Long) = {
    val slices = timeline.latestCommitTimestamp
      .map(fsView.slicesAsOf(_))
      .getOrElse(Vector.empty)
    val (rows, bytes) = graft.fs.FileStatsEstimator.estimateRowsBytes(slices, hadoopConf)
    (rows.getOrElse(0L), bytes)
  }

  /** Inferred CDC feed over `(start, end]`: upstream's `(op, ts_ms,
    * before, after)` image rows, computed per commit by file-group diffs
    * — see [[graft.sources.CdcRead]] for semantics, scale shape, and the
    * refusal set (non-clustering replaces, meta-field-less tables,
    * archived predecessors).
    */
  def cdc(start: Option[String], end: Option[String] = None): DataFrame =
    graft.sources.CdcRead.changes(spark, basePath, start, end, readOptions)

  /** Incremental read of records changed in `(start, end]` (S3): only file
    * groups touched by in-range commits, with the `_hoodie_commit_time` row
    * filter (P5, file_group/reader.rs:652-701).
    */
  def incremental(
      start: Option[String],
      end: Option[String] = None,
      partitionFilters: Seq[PartitionFilter] = Nil
  ): DataFrame = {
    val endTs = end
      .map(Timestamps.normalize(_, config.timelineTimezone))
      .orElse(timeline.latestCommitTimestamp)
    endTs match {
      case None => LogScan.emptyDf(spark, tableSchema)
      case Some(e) =>
        val s = start.map(Timestamps.normalize(_, config.timelineTimezone))
        // UNFILTERED incremental reads delegate to the DSv2 relation
        // like snapshot() (r12): identical (start, end] contract —
        // range-bounded log decode + per-row commit filter — through
        // the per-slice merge (columnar-eligible) plus the DSv2-only
        // planning tiers (stats-contained proofs, index-tier
        // restriction), instead of the DataFrame union+window merge.
        // same gates as snapshot(): optioned handles keep the legacy
        // path; the end pin always rides along (resolved from THIS
        // handle's timeline), keeping the handle self-consistent
        if (partitionFilters.isEmpty && readOptions.isEmpty) {
          var r = spark.read.format("hudi-graft").option("query.type", "incremental")
            .option("end.timestamp", e)
          s.foreach(ts => r = r.option("start.timestamp", ts))
          r.load(basePath)
        } else {
          // partition pruning applies to incremental too — only stats
          // pruning is excluded (read_options.rs:75-80)
          val slices = fsView.slicesBetween(s, e, prunerFor(partitionFilters))
          readSlices(slices, InstantRange(s, Some(e)), commitRange = Some((s, e)))
        }
    }
  }

  /** Read + merge a planned set of slices. */
  private def readSlices(
      slices: Seq[FileSlice],
      range: InstantRange,
      commitRange: Option[(Option[String], String)]
  ): DataFrame = {
    // log-only slices (no base yet — pre-first-compaction MOR writes)
    // contribute through the log branch only
    val baseBearing = slices.filter(_.baseFile.isDefined)
    val baseFiles = baseBearing.flatMap(_.baseFile).map(_.path)
    if (baseFiles.isEmpty && !slices.exists(_.hasLogFiles))
      return LogScan.emptyDf(spark, tableSchema)

    val schema = tableSchema
    val baseDf =
      if (baseFiles.isEmpty) LogScan.emptyDf(spark, schema)
      else if (droppedPartitionFields.isEmpty)
        readBaseDf(schema, baseFiles)
      else {
        // P6: per-partition scan with the partition values re-injected as
        // typed literals (the columns are not in the files)
        val fileSchema = StructType(schema.fields.filterNot(f => droppedPartitionFields.contains(f.name)))
        val parse = prunerFor(Nil)
        baseBearing.groupBy(_.partitionPath).toSeq.sortBy(_._1).map { case (p, ss) =>
          // a null-sentinel segment stands for NULL, not for its own
          // rendering — dropping it injects NULL below (orNull)
          val vals = parse.parseSegmentsLenient(p).getOrElse(Map.empty)
            .filterNot { case (_, v) =>
              v.isInstanceOf[String] &&
                config.isPartitionNullSentinel(v.asInstanceOf[String]) }
          val df = readBaseDf(fileSchema, ss.flatMap(_.baseFile).map(_.path))
          val withParts = droppedPartitionFields.foldLeft(df) { (acc, f) =>
            val target = schema.fields.find(_.name == f).get.dataType
            val v = vals.get(f).map {
              case d: java.time.LocalDate => java.sql.Date.valueOf(d)
              case other => other
            }.orNull
            acc.withColumn(f, lit(v).cast(target))
          }
          withParts.select(schema.fieldNames.map(col).toIndexedSeq: _*)
        }.reduce(_ unionByName _)
      }
    // P6 for log records: the writer schema omits dropped partition
    // columns too — the log decode re-injects the slice's parsed values
    val logPartValues: FileSlice => Map[String, Any] =
      if (droppedPartitionFields.isEmpty) _ => Map.empty
      else {
        val parse = prunerFor(Nil)
        val dropped = droppedPartitionFields
        sl => {
          val vals = parse.parseSegmentsLenient(sl.partitionPath).getOrElse(Map.empty)
            .filterNot { case (_, v) =>
              v.isInstanceOf[String] &&
                config.isPartitionNullSentinel(v.asInstanceOf[String]) }
          dropped.flatMap(f => vals.get(f).map {
            case d: java.time.LocalDate => f -> java.sql.Date.valueOf(d)
            case other => f -> other
          }).toMap
        }
      }

    // commit-time row filtering requires meta fields; without them the
    // incremental read returns every row of every touched file group —
    // the reference behaves identically (reader.rs:656-661 returns no
    // mask when populates_meta_fields is false), so this is parity, not
    // an omission
    val commitFilter: DataFrame => DataFrame = commitRange match {
      case Some((s, e)) if config.populatesMetaFields =>
        df => {
          val c = col(MetaField.CommitTime)
          val lower = s.map(c > _).getOrElse(lit(true))
          df.filter(lower && c <= e)
        }
      case _ => identity
    }

    val hasLogs = slices.exists(_.hasLogFiles)
    if (!hasLogs) return commitFilter(baseDf)

    val conf = serConf
    val strategy = config.recordMergeStrategy
    val needDeletes = strategy == "OVERWRITE_WITH_LATEST" && orderingField.isDefined
    val (logDf, deletes) =
      if (needDeletes) {
        // single pass over the log files for data AND delete blocks
        val of = orderingField.get
        val ordType = schema.fields.find(_.name == of).map(_.dataType).getOrElse(LongType)
        val (d, del) = LogScan.dataFrameOfLogAndDeletes(
          spark, basePath, slices, schema, of, ordType, range, conf, logPartValues)
        (d, Some(del))
      } else
        (LogScan.dataFrameOfLogRecords(spark, slices, schema, range, conf, logPartValues), None)
    val data = commitFilter(baseDf.unionByName(logDf))
    MorMerge.merge(data, deletes, orderingField, strategy)
  }
}

object HudiTable {
  def apply(spark: SparkSession, basePath: String): HudiTable =
    cached(spark, basePath, Map.empty)
  def apply(spark: SparkSession, basePath: String, readOptions: Map[String, String]): HudiTable =
    cached(spark, basePath, readOptions)

  /** Session-shared open-table cache, revalidated on EVERY open by a
    * timeline fingerprint — the analog of Hudi's FileSystemViewManager:
    * opening a table costs a hoodie.properties read, a timeline listing,
    * commit-metadata JSON reads and (first scan) partition listings and
    * footers, all repeated identically for every query against an
    * unchanged table. The fingerprint is one `listStatus` of the active
    * timeline dir plus the hoodie.properties status: any commit, rollback,
    * clean, archive or config change alters it, so a changed table is
    * re-opened fresh (which is also exactly what the streaming source's
    * `freshTable` wants — a new view only when there IS new data). A
    * fingerprint failure fails open to a fresh build.
    */
  private def cached(s: SparkSession, basePath: String, opts: Map[String, String]): HudiTable = {
    val reg = graft.queries.SessionRegistry.of(s)
    val key = s"huditable:$basePath:" +
      opts.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")
    reg.synchronized {
      reg.get(key) match {
        case Some((t: HudiTable, fp: String)) if fp.nonEmpty && fingerprint(t) == fp => t
        case _ =>
          val t = new HudiTable(s, basePath, opts)
          reg.put(key, (t, fingerprint(t)))
          t
      }
    }
  }

  /** Fingerprint listings taken (one `listStatus` of the timeline dir
    * each) — the per-open revalidation cost. Counter-asserted by specs
    * that bound a streaming drain's planning IO.
    */
  val fingerprintListings = new java.util.concurrent.atomic.AtomicLong

  /** (name, length, mtime) of every file in the active timeline dir plus
    * hoodie.properties — instant files are immutable by contract, so this
    * changes iff the table changed. Empty-string sentinel on any IO error
    * (never matches a stored fingerprint → rebuild).
    */
  private def fingerprint(t: HudiTable): String =
    try {
      fingerprintListings.incrementAndGet()
      val fs = t.timeline.dir.getFileSystem(t.hadoopConf)
      val entries =
        if (!fs.exists(t.timeline.dir)) Vector.empty
        else fs.listStatus(t.timeline.dir).iterator
          .filter(_.isFile)
          .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
          .toVector.sorted
      val props = new org.apache.hadoop.fs.Path(t.basePath, ".hoodie/hoodie.properties")
      val propsSig =
        if (fs.exists(props)) {
          val st = fs.getFileStatus(props)
          s"${st.getLen}:${st.getModificationTime}"
        } else "absent"
      (entries :+ s"props=$propsSig").mkString("|")
    } catch { case scala.util.control.NonFatal(_) => "" }
}
