package graft.write

import graft.core.{HoodieConfig, MetaField}
import graft.table.HudiTable
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Write path for `df.write.format("hudi-graft")` — the user-facing
  * surface the reference stops short of (docs/reader-spec.md:345 declares
  * the reference read-only; BASELINE's north star says read AND write).
  *
  * Supported: COPY_ON_WRITE (base-file rewrites) and MERGE_ON_READ
  * (deltacommit log appends) targets; single- and multi-field record
  * keys (bare Simple rendering, or ComplexKeyGenerator `f:v` rendering
  * with null/empty placeholders); multi-level partition paths incl.
  * hive-style; operations `insert` / `bulk_insert` / `upsert` / `delete`
  * (the input names keys to remove — key + partition columns suffice; a
  * COW group losing every row writes an EMPTY base-file version so the
  * deletion is visible) / `insert_overwrite_table`, SaveModes Append
  * (per the operation option), Overwrite (insert_overwrite_table as a
  * REPLACECOMMIT — history preserved, incremental/CDC readers see the
  * replacement), ErrorIfExists and Ignore. Partitioning comes from the
  * `hoodie.datasource.write.partitionpath.field` option or
  * `.partitionBy(...)`. Advertised `files` and `record_index` MDT
  * partitions are MAINTAINED on every commit (and the record index
  * serves the upsert probe); other index partitions, TimestampBased/
  * custom key generators, and non-parquet base formats refuse loudly.
  *
  * Layout written (the real-Hudi v6 invariants the readers and specs
  * pin): `hoodie.properties` with key/precombine/keygenerator fields;
  * base files named `{fileId}_{writeToken}_{instant}.parquet` holding the
  * five meta columns; a `requested` → `inflight` → completed instant
  * triple per commit; JSON commit metadata whose write stats carry
  * fileId/path/partitionPath/prevCommit/numWrites/numUpdateWrites/
  * fileSizeInBytes and `extraMetadata.schema` (the writer's data schema).
  *
  * Scale shape: ONE shuffle per commit — rows route to their target file
  * group (hash-bucketed for fresh groups, the matched group for upserts)
  * and each (partition, fileGroup) writes exactly one parquet file from
  * one task via `partitionBy` staging; the driver then RENAMES files into
  * Hudi names and writes metadata, O(#files) namenode ops (the standard
  * committer cost, never data movement). The upsert index probe is a
  * key-column join against the current snapshot pruned to
  * (key, partition, file name) — column-pruned scan, shuffle bounded by
  * table keys + batch keys. At 100 TB the MDT record-level index would
  * replace that probe (the read side already consumes it; wiring it into
  * the writer is surfacing, not capability). The touched-fileId collect
  * is bounded by DISTINCT matched file groups — table file count, never
  * key count (the same bound AggMaintenance documents).
  *
  * Incoming rows are deduplicated per (key, partition) by the precombine
  * field (greatest wins; ties and no-precombine keep one row
  * deterministically), then incoming ALWAYS wins over stored — upstream's
  * default OverwriteWithLatestAvroPayload. Carried stored rows keep their
  * original `_hoodie_commit_time` (the COW stamp-preservation every
  * incremental/CDC reader in this repo depends on) while their
  * `_hoodie_file_name` moves to the rewritten file, exactly like real
  * Hudi. The upsert index is NON-GLOBAL (upstream's default): the probe
  * keys on (record key, partition path), so a row arriving with a
  * CHANGED partition value inserts there and leaves the old partition's
  * copy in place — exactly upstream's non-global bloom/simple index
  * behavior.
  */
object HudiWriter {

  private val Token = "0-0-0"

  /** Observability for specs: how many upsert/delete probes planned a
    * full-snapshot key join vs an MDT record-index lookup. The indexed
    * path must show snapshotProbes unchanged (zero snapshot scans).
    */
  val snapshotProbes = new java.util.concurrent.atomic.AtomicLong(0L)
  val indexProbes = new java.util.concurrent.atomic.AtomicLong(0L)

  /** SQL `CREATE TABLE` support: write the `.hoodie` metadata for an
    * EMPTY table — no data commit — including
    * `hoodie.table.create.schema`, which is what serves reads (and the
    * first INSERT's schema check) before any commit exists.
    */
  def createTable(
      spark: SparkSession,
      basePath: String,
      dataSchema: org.apache.spark.sql.types.StructType,
      partitionColumns: Seq[String],
      options: Map[String, String]): Unit = {
    val opts = new Options(options)
    val fs = new Path(basePath).getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new Path(basePath, ".hoodie/hoodie.properties")))
      throw new IllegalArgumentException(s"hudi-graft: table already exists at $basePath")
    val keyFields = opts.recordKeyFields.getOrElse(throw new IllegalArgumentException(
      "hudi-graft: CREATE TABLE requires hoodie.datasource.write.recordkey.field " +
        "(or the primaryKey table property)"))
    val partFields =
      if (partitionColumns.nonEmpty) partitionColumns
      else opts.partitionPathFields.getOrElse(Nil)
    val precombine = opts.precombineField
    (keyFields ++ partFields ++ precombine.toSeq).foreach { f =>
      require(dataSchema.fieldNames.contains(f),
        s"hudi-graft: column '$f' absent from the declared schema")
    }
    val createSchema =
      try graft.log.SparkToAvro.toAvroSchema(dataSchema, "graft_create_record").toString
      catch {
        case e: IllegalArgumentException => throw new UnsupportedOperationException(
          s"hudi-graft: CREATE TABLE cannot record this schema (${e.getMessage}); " +
            "only flat column types are supported", e)
      }
    val tableType =
      if (opts.tableType.equalsIgnoreCase("MERGE_ON_READ")) "MERGE_ON_READ"
      else "COPY_ON_WRITE"
    writeTableProperties(fs, new Path(basePath), opts, keyFields, partFields, precombine,
      tableType, keyFields.size > 1 || partFields.size > 1, opts.hiveStylePartitioning,
      createSchema = Some(createSchema))
  }

  /** Write `df` and return the created commit instants (one element; empty
    * for Ignore-mode no-ops).
    */
  def write(
      spark: SparkSession,
      basePath: String,
      df: DataFrame,
      mode: SaveMode,
      options: Map[String, String]): Seq[String] = {
    val opts = new Options(options)
    val fs = new Path(basePath).getFileSystem(spark.sessionState.newHadoopConf())
    val propsPath = new Path(basePath, ".hoodie/hoodie.properties")
    val exists = fs.exists(propsPath)

    mode match {
      case SaveMode.Ignore if exists => return Nil
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(
          s"hudi-graft: table already exists at $basePath (SaveMode.ErrorIfExists); " +
            "use Append or Overwrite")
      case _ =>
    }

    val existing = if (exists) Some(HudiTable(spark, basePath)) else None
    existing.foreach { t =>
      if (!t.config.baseFileFormat.equalsIgnoreCase("PARQUET"))
        throw new UnsupportedOperationException(
          s"hudi-graft: base file format ${t.config.baseFileFormat} is not writable " +
            "(this writer produces parquet base files)")
      if (!t.config.populatesMetaFields)
        throw new UnsupportedOperationException(
          "hudi-graft: hoodie.populate.meta.fields=false tables are not writable here")
      // an advertised metadata table must stay FRESH under this writer.
      // The `files` partition is maintained (MdtMaintenance appends the
      // commit's file additions as an MDT deltacommit) and so is
      // `record_index` (RecordIndexMaintenance appends created-key
      // entries / deleted-key tombstones, and the upsert probe routes
      // through it); the remaining INDEX partitions (column_stats/
      // secondary/bloom) are not — a commit would leave them stale and
      // index-served reads silently wrong, so those tables refuse
      val mdtParts = t.config.getOrElse("hoodie.table.metadata.partitions", "")
        .split(",").map(_.trim).filter(_.nonEmpty).toSet
      val unmaintained =
        mdtParts - "files" - "record_index" - "column_stats" - "partition_stats" -
          "bloom_filters" --
          mdtParts.filter(_.startsWith(graft.table.SecondaryIndex.PartitionPrefix))
      if (unmaintained.nonEmpty)
        throw new UnsupportedOperationException(
          s"hudi-graft: the table advertises metadata-table partitions " +
            s"(${unmaintained.toSeq.sorted.mkString(",")}) this writer does not maintain " +
            "— a commit would leave them stale and index-served reads silently wrong")
    }
    // secondary indexes: identity STRING indexes are maintained; anything
    // else (numeric/date renderings, expression indexes) throws here —
    // the refusal must land BEFORE any bytes are written
    val secondaryIndexes: Seq[(String, String)] = existing.map { t =>
      val parts = t.config.getOrElse("hoodie.table.metadata.partitions", "")
        .split(",").map(_.trim)
        .filter(_.startsWith(graft.table.SecondaryIndex.PartitionPrefix)).toSeq
      if (parts.isEmpty) Nil
      else SecondaryIndexMaintenance.resolveWritable(basePath,
        spark.sessionState.newHadoopConf(), t.tableSchema, parts)
    }.getOrElse(Nil)

    val keyFields: Seq[String] = opts.recordKeyFields
      .orElse(existing.map(_.config.recordKeyFields).filter(_.nonEmpty))
      .getOrElse(throw new IllegalArgumentException(
        "hudi-graft: hoodie.datasource.write.recordkey.field is required"))
    val partFields: Seq[String] = opts.partitionPathFields
      .orElse(existing.map(_.config.partitionFields).filter(_.nonEmpty))
      .getOrElse(Nil)
    val precombine = opts.precombineField
      .orElse(existing.map(_.config).flatMap(_.orderingFields.headOption))

    // key/partition RENDERING must match what the table's generator wrote,
    // or the upsert probe joins on strings that can never match: bare
    // values for Simple/Nonpartitioned, `field:value` (null/empty
    // placeholders) for Complex; TimestampBased and custom generators
    // transform the partition value in ways this writer does not
    // implement — refuse rather than write rows into wrong directories
    val keygenSimpleName = existing.flatMap(_.config.keyGeneratorClass)
      .map(c => c.substring(c.lastIndexOf('.') + 1))
    keygenSimpleName.foreach { c =>
      val known = Set(
        "SimpleKeyGenerator", "SimpleAvroKeyGenerator",
        "NonpartitionedKeyGenerator", "NonpartitionedAvroKeyGenerator",
        "ComplexKeyGenerator", "ComplexAvroKeyGenerator")
      if (!known.contains(c))
        throw new UnsupportedOperationException(
          s"hudi-graft: key generator $c renders keys/partitions in ways this " +
            "writer does not reproduce; writing would corrupt the layout")
    }
    val renderComplex = keyFields.size > 1 ||
      keygenSimpleName.exists(_.startsWith("Complex")) ||
      (existing.isEmpty && partFields.size > 1)
    val hiveStyle = existing.map(_.config.isHiveStylePartitioning)
      .getOrElse(opts.hiveStylePartitioning)
    existing.foreach { t =>
      if (t.config.isPartitionPathUrlencoded)
        throw new UnsupportedOperationException(
          "hudi-graft: hoodie.datasource.write.partitionpath.urlencode=true tables " +
            "are not writable (URL-encoded segment rendering is not implemented)")
    }

    // MOR targets take every data write as a DELTACOMMIT (real Hudi's
    // convention): inserts still produce parquet base files (new file
    // groups), while upsert/delete land as avro-data/delete LOG blocks on
    // the matched group's latest slice — compaction stays a separate,
    // unimplemented table service, exactly like a real Hudi deltastreamer
    // between compactions
    val isMor = existing.map(_.config.isMor)
      .getOrElse(opts.tableType.equalsIgnoreCase("MERGE_ON_READ"))

    val operation =
      if (mode == SaveMode.Overwrite && exists) "insert_overwrite_table"
      else opts.operation
    val maintainsRecordIndex = existing.exists(t =>
      graft.table.RecordIndex.isAvailable(t.config))
    if ((maintainsRecordIndex || secondaryIndexes.nonEmpty) &&
        operation == "insert_overwrite_table")
      throw new UnsupportedOperationException(
        "hudi-graft: insert_overwrite_table on a record_index/secondary-index table is " +
          "not supported — the replacement invalidates every index entry and a rebuild " +
          "is not implemented")
    if (isMor && exists && precombine.isEmpty &&
        (operation == "upsert" || operation == "delete"))
      throw new UnsupportedOperationException(
        "hudi-graft: MOR upsert/delete merge log rows by the ordering (precombine) " +
          "field — a table without one reads APPEND_ONLY and the log append would " +
          "duplicate rather than overwrite; set hoodie.datasource.write.precombine.field")

    // meta columns in the input are writer-owned — recomputed, never trusted
    val data0 = df.drop((MetaField.all :+ MetaField.Operation): _*)
    // "__"-prefixed input columns would collide with the writer's internal
    // routing columns (__key/__part/__fid/__rn/__bucket) AND the staged-file
    // data-column filter — silent clobber/loss; refuse loudly instead
    val dunder = data0.columns.filter(_.startsWith("__"))
    if (dunder.nonEmpty)
      throw new IllegalArgumentException(
        s"hudi-graft: input columns may not start with '__' " +
          s"(${dunder.mkString(",")}) — the prefix is reserved for writer-internal routing")
    // delete inputs name KEYS to remove (key + partition columns suffice,
    // like upstream); every other operation writes full rows
    // a GLOBAL (record-index) delete matches on the key alone — the
    // partition columns are not required in the input (the index knows
    // each key's location)
    val globalDelete = operation == "delete" && maintainsRecordIndex
    val needed =
      if (operation == "delete") keyFields ++ (if (globalDelete) Nil else partFields)
      else keyFields ++ partFields ++ precombine.toSeq
    needed.foreach { f =>
      require(data0.columns.contains(f), s"hudi-graft: column '$f' absent from the input")
    }
    // SCHEMA EVOLUTION on write: every table data column must arrive with
    // the same or a WIDER type (int→long, float→double — the widenings
    // the read side already resolves commit-metadata-first,
    // `hudi_schema_widened`); extra input columns APPEND to the schema
    // (recorded in this commit's extraMetadata.schema; older files
    // null-fill on read). Missing columns and narrowings refuse —
    // silently dropping or truncating data is never an evolution.
    if (operation != "delete") existing.foreach { t =>
      val tableData = t.tableSchema.fields.filterNot(f => MetaField.all.contains(f.name))
      val inTypes = data0.schema.fields.map(f => f.name -> f.dataType).toMap
      val missing = tableData.map(_.name).filterNot(inTypes.contains)
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"hudi-graft: input is missing table columns ${missing.sorted.mkString(",")} — " +
            "column drops are not a supported schema evolution")
      tableData.foreach { f =>
        val in = inTypes(f.name)
        if (in != f.dataType && !widens(f.dataType, in))
          throw new IllegalArgumentException(
            s"hudi-graft: column '${f.name}' arrives as $in but the table records " +
              s"${f.dataType} — only identical types or widenings (int→long, " +
              "float→double) are supported")
      }
    }
    // reconcile to the TABLE's column order (upstream does the same): a
    // df.select("b","a") upsert must not flip the commit-recorded schema
    // — readers resolve the table schema commit-metadata-first and a
    // reordered commit would swap positional consumers' columns. ADDED
    // columns append after the table's, in input order.
    val data = existing match {
      case Some(t) if operation != "delete" =>
        val tableOrder = t.tableSchema.fieldNames.filterNot(MetaField.all.contains)
        val added = data0.columns.filterNot(tableOrder.contains)
        data0.select((tableOrder ++ added).map(col).toIndexedSeq: _*)
      case _ => data0
    }

    val timelineTz = existing.map(_.config.timelineTimezone).getOrElse("UTC")
    val instant = nextInstant(existing.flatMap(_.timeline.latestCommitTimestamp), timelineTz)
    val base = new Path(basePath)

    if (!exists)
      writeTableProperties(fs, base, opts, keyFields, partFields, precombine,
        if (isMor) "MERGE_ON_READ" else "COPY_ON_WRITE", renderComplex, hiveStyle)

    // supplemental CDC logging: sidecars are emitted for REWRITTEN groups
    // when the table carries hoodie.table.cdc.enabled with
    // data_before_after mode (create-time option or existing table
    // config); fresh groups need none (readers serve them one-sided),
    // and replacecommits follow upstream (inference diffs them)
    val cdcMode: Option[String] = existing.map(_.config)
      .map(c => if (c.cdcEnabled) Some(c.cdcSupplementalLoggingMode) else None)
      .getOrElse(if (opts.cdcEnabled) Some(opts.cdcLoggingMode) else None)

    // ---- key/partition assignment --------------------------------------
    // Simple rendering: the bare field value. Complex rendering (multi
    // field keys, or a Complex-keygen table): `f1:v1,f2:v2` with
    // KeyGenUtils' `__null__`/`__empty__` placeholders. Partition
    // segments render null-or-empty as the hive sentinel (Hudi 0.11+'s
    // rule on every layout), `f=v` per segment under hive-style, joined
    // by '/'
    val hiveSentinel = "__HIVE_DEFAULT_PARTITION__"
    val keyExpr =
      if (!renderComplex) col(keyFields.head).cast(StringType)
      else concat_ws(",", keyFields.map { f =>
        val s = col(f).cast(StringType)
        concat(lit(f + ":"),
          when(col(f).isNull, lit("__null__"))
            .when(s === "", lit("__empty__"))
            .otherwise(s))
      }: _*)
    val partExpr = partFields match {
      case Seq() => lit("")
      case fs => concat_ws("/", fs.map { f =>
        val s = col(f).cast(StringType)
        val v = when(col(f).isNull || s === "", lit(hiveSentinel)).otherwise(s)
        if (hiveStyle) concat(lit(f + "="), v) else v
      }: _*)
    }
    // a keys-only global delete may lack the partition columns — its
    // __part is never consulted (locations come from the index)
    val partExprSafe =
      if (globalDelete && partFields.exists(f => !data.columns.contains(f))) lit("")
      else partExpr
    val keyed0 = data
      .withColumn("__key", keyExpr)
      .withColumn("__part", partExprSafe)
    // dedupe incoming per (key, partition): greatest precombine wins;
    // without one, an arbitrary-but-deterministic single row survives
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__key"), col("__part"))
      .orderBy(precombine.filter(f => operation != "delete" && data.columns.contains(f))
        .map(f => col(f).desc_nulls_last).getOrElse(col("__key").asc))
    val keyed = keyed0
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .persist()

    try {
      val routed = operation match {
        case "insert" | "bulk_insert" =>
          val staged = routeFresh(keyed, instant, opts)
          Routed(staged, newKeys = Some(staged))
        case "insert_overwrite_table" =>
          val rep = existing.map(_.fsView.slicesAsOf(instant)
            .groupBy(_.partitionPath).view.mapValues(_.map(_.fileId).toSet).toMap)
            .getOrElse(Map.empty[String, Set[String]])
          Routed(routeFresh(keyed, instant, opts), replaced = rep)
        case "upsert" =>
          existing match {
            case None =>
              val staged = routeFresh(keyed, instant, opts)
              Routed(staged, newKeys = Some(staged))
            case Some(t) if t.config.isMor =>
              routeMorUpsert(spark, basePath, t, keyed, instant, opts)
            case Some(t) => routeUpsert(spark, basePath, t, keyed, instant, opts, cdcMode)
          }
        case "delete" =>
          existing match {
            case None => throw new IllegalArgumentException(
              "hudi-graft: operation 'delete' on a nonexistent table")
            case Some(t) if t.config.isMor =>
              routeMorDelete(spark, basePath, t, keyed, instant)
            case Some(t) => routeDelete(spark, basePath, t, keyed, instant, cdcMode)
          }
        case other =>
          throw new IllegalArgumentException(
            s"hudi-graft: unknown hoodie.datasource.write.operation '$other' " +
              "(insert | bulk_insert | upsert | delete | insert_overwrite_table)")
      }

      val maintainsColStats = existing.exists(t =>
        graft.table.ColumnStatsIndex.isAvailable(t.config))
      val maintainsPartStats = existing.exists(t =>
        graft.table.PartitionStatsIndex.isAvailable(t.config))
      // captured BEFORE staging writes any new partition dir (the fs
      // view lists lazily) — "was this partition new to this commit?"
      val priorPartitions: Set[String] =
        if (maintainsPartStats) existing.get.fsView.partitionPaths.toSet else Set.empty
      val (files, fileStats) = writeStagedWithStats(spark, fs, base, routed.staged,
        instant, routed.requiredGroups,
        if (maintainsColStats || maintainsPartStats) statColumnsOf(routed.staged.schema)
        else Nil)
      // the commit's recorded schema is the TABLE's data schema — a
      // keys-only delete input must not shrink it (readers resolve the
      // table schema commit-metadata-first)
      val commitSchema: org.apache.spark.sql.types.StructType =
        if (operation == "delete")
          org.apache.spark.sql.types.StructType(existing.get.tableSchema.fields
            .filterNot(f => MetaField.all.contains(f.name)))
        else data.schema
      // files-partition MDT maintenance: the MDT deltacommit (same
      // instant) completes BEFORE the data commit, so any reader that
      // sees the data instant sees an MDT at least as new
      val maintainsMdt = existing.exists(_.config
        .getOrElse("hoodie.table.metadata.partitions", "").split(",")
        .map(_.trim).contains("files"))
      if (maintainsMdt)
        MdtMaintenance.appendFiles(basePath, spark.sessionState.newHadoopConf(), instant,
          files.map { case (p, _, rel, _, bytes) =>
            (p, rel.substring(rel.lastIndexOf('/') + 1), bytes)
          } ++ routed.logWrites.map { lw =>
            (lw.partition, lw.relPath.substring(lw.relPath.lastIndexOf('/') + 1), lw.bytes)
          })
      // record-index maintenance: created-key entries + deleted-key
      // tombstones land as an MDT deltacommit BEFORE the data commit
      // (same freshness contract as the files partition)
      if (maintainsRecordIndex && (routed.newKeys.nonEmpty || routed.deletedKeys.nonEmpty))
        RecordIndexMaintenance.append(spark, basePath, instant,
          routed.newKeys, routed.deletedKeys, timelineTz)
      // column_stats maintenance: exact per-(file, column) bounds from
      // the staging pass, appended before the data commit
      lazy val statEntries = colStatsEntries(files, fileStats, routed.staged.schema)
      if (maintainsColStats && fileStats.nonEmpty)
        ColumnStatsMaintenance.append(basePath, spark.sessionState.newHadoopConf(),
          instant, statEntries)
      // partition_stats maintenance: partition-level bounds UNIONED with
      // the existing entry (the record must stay a superset of the
      // truth). A pre-existing partition with NO entry stays uncovered
      // (fail-open at the pruner) rather than getting a bound that
      // excludes its old files; brand-new partitions get fresh bounds
      if (maintainsPartStats && fileStats.nonEmpty) {
        val conf = spark.sessionState.newHadoopConf()
        val existingBounds = graft.table.PartitionStatsIndex.load(basePath, conf)
        def lo(a: Any, b: Any) =
          if (a.asInstanceOf[Comparable[Any]].compareTo(b) <= 0) a else b
        def hi(a: Any, b: Any) =
          if (a.asInstanceOf[Comparable[Any]].compareTo(b) >= 0) a else b
        val merged = statEntries.groupBy(e => (e.partition, e.column)).toSeq
          .sortBy(_._1).flatMap { case ((p, c), es) =>
            val newMn = es.map(_.min).reduce(lo)
            val newMx = es.map(_.max).reduce(hi)
            existingBounds.get(p).flatMap(_.get(c)) match {
              case Some((omn, omx)) if omn.getClass == newMn.getClass =>
                Some((p, c, es.head.wrapper, lo(omn, newMn), hi(omx, newMx)))
              case Some(_) =>
                throw new UnsupportedOperationException(
                  s"hudi-graft: partition_stats entry for ($p, $c) carries a different " +
                    "value type than this write — merging would corrupt the bound")
              case None if !priorPartitions.contains(p) =>
                Some((p, c, es.head.wrapper, newMn, newMx))
              case None => None
            }
          }
        ColumnStatsMaintenance.appendPartitionStats(basePath, conf, instant, merged)
      }
      // bloom_filters maintenance: one distributed key-column scan of the
      // written files builds SIMPLE blooms (zero-row empty bases skip —
      // a missing bloom fails open at the probe)
      val maintainsBloom = existing.exists(t =>
        graft.table.BloomFilterIndex.isAvailable(t.config))
      if (maintainsBloom)
        BloomFilterMaintenance.append(spark, basePath, instant,
          files.filter(_._4 > 0).map { case (p, _, rel, rows, _) =>
            (p, rel.substring(rel.lastIndexOf('/') + 1), rows)
          })
      // secondary-index maintenance: old values from the PRE-COMMIT
      // snapshot (the data commit hasn't completed yet) joined with the
      // incoming batch — changed values tombstone the old entry and add
      // the new one; a missing entry would lose rows, a stale extra one
      // only costs pruning
      if (secondaryIndexes.nonEmpty) {
        val pre = spark.read.format("hudi-graft").load(basePath)
        // canonical key rendering: strings verbatim; integrals via the
        // long widening (decimal digits — the family-free rendering
        // SecondaryIndex.renderLiteral probes with)
        def rendered(df: DataFrame, column: String): org.apache.spark.sql.Column =
          df.schema(column).dataType match {
            case StringType => col(column)
            case _ => col(column).cast("long").cast(StringType)
          }
        // insert/bulk_insert never REMOVE rows: a duplicate-key insert
        // leaves the old row live, so tombstoning its old value entry
        // would index-prune a live row away — inserts are ADD-ONLY
        // (a stale extra entry only costs pruning)
        val addOnly = operation == "insert" || operation == "bulk_insert"
        // ONE pre-commit projection of every indexed column, bounded to
        // the batch keys and persisted across the per-index appends
        // (N indexes must not cost N snapshot scans)
        val idxCols = secondaryIndexes.map(_._2).distinct
        val olds0 =
          if (addOnly) None
          else Some(pre.select(col(MetaField.RecordKey).as("__key") +:
            idxCols.map(c => rendered(pre, c).as(s"__old_$c")): _*)
            .join(keyed.select("__key").distinct(), Seq("__key"), "left_semi")
            .persist())
        try {
          for ((idxPart, column) <- secondaryIndexes) {
            val news =
              if (operation == "delete")
                keyed.select("__key").distinct()
                  .withColumn("__new", lit(null).cast(StringType))
              else keyed.select(col("__key"), rendered(keyed, column).as("__new"))
            val changes = olds0 match {
              case None => news.withColumn("__old", lit(null).cast(StringType))
              case Some(o) => news.join(
                o.select(col("__key"), col(s"__old_$column").as("__old")),
                Seq("__key"), "full_outer")
            }
            SecondaryIndexMaintenance.append(spark, basePath, instant, idxPart, changes)
          }
        } finally olds0.foreach(df => scala.util.Try(df.unpersist()))
      }
      val tableVersion = existing.map(_.config.tableVersion).getOrElse(6)
      writeTimeline(fs, base, instant, operation, files, routed, commitSchema, tableVersion,
        timelineTz, isMor)
      routed.retained.foreach(df => scala.util.Try(df.unpersist()))
      Seq(instant)
    } finally keyed.unpersist()
  }

  // ---- routing ------------------------------------------------------------

  /** One operation's routing outcome: the staged rows plus the metadata
    * the commit needs. `requiredGroups` (fid → partition) names rewritten
    * groups that must produce a base-file version even when ZERO rows
    * survive (a fully-deleted group — without the empty version, its old
    * slice would stay visible and the deleted rows resurrect).
    */
  private final case class Routed(
      staged: DataFrame,
      updateCounts: Map[String, Long] = Map.empty,
      deleteCounts: Map[String, Long] = Map.empty,
      replaced: Map[String, Set[String]] = Map.empty,
      prevCommits: Map[String, String] = Map.empty,
      cdcFiles: Map[String, (String, Long)] = Map.empty,
      requiredGroups: Map[String, String] = Map.empty,
      logWrites: Seq[LogWrite] = Nil,
      // record-index maintenance inputs: locations of keys this commit
      // CREATED (fresh routing output) and keys it REMOVED
      newKeys: Option[DataFrame] = None,
      deletedKeys: Option[DataFrame] = None,
      // persisted frames the MAINTENANCE passes still consume — routing
      // must not unpersist them on return (the probe/join would silently
      // re-execute per pass); write() releases them after the commit
      retained: Seq[DataFrame] = Nil)

  /** One MOR log file this commit appended: becomes a write-stats entry
    * (numUpdateWrites or numDeletes = rows) alongside the base files.
    */
  private[write] final case class LogWrite(
      partition: String,
      fileId: String,
      relPath: String,
      rows: Long,
      bytes: Long)

  /** Fresh-group routing: hash-bucket keys into N new file groups per
    * partition, N from the PLANNED input size (Catalyst's estimate — no
    * extra job) over the target file size. Deterministic fileIds derive
    * from md5(instant/partition/bucket) — a codegen'd expression, no
    * per-row UDF in the insert hot path.
    */
  private def routeFresh(keyed: DataFrame, instant: String, opts: Options): DataFrame = {
    val bytes = BigInt(keyed.queryExecution.optimizedPlan.stats.sizeInBytes.toString)
    // stats-less leaves (RDD-backed frames, JDBC) estimate at
    // spark.sql.defaultSizeInBytes (≈ Long.Max) — an absurd reading must
    // not explode into 4096 tiny files; fall back to the cluster's
    // parallelism as the group count
    val groups =
      if (bytes > BigInt(1L << 50))
        keyed.sparkSession.sparkContext.defaultParallelism.max(1)
      else (bytes / opts.maxFileBytes).toLong.max(0L).min(4096L).toInt + 1
    val fidExpr = {
      val h = md5(concat(lit(s"$instant/"), col("__part"), lit("/"),
        col("__bucket").cast(StringType)))
      concat_ws("-",
        substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
        substring(h, 17, 4), concat(substring(h, 21, 12), lit("-0")))
    }
    keyed
      .withColumn("__bucket", pmod(xxhash64(col("__key")), lit(groups)).cast("int"))
      .withColumn("__fid", fidExpr)
      .withColumn(MetaField.CommitTime, lit(instant))
      .drop("__bucket")
  }

  /** (key → location) probe shared by upsert/delete routing. On a
    * record_index table, the batch's distinct keys look up the MDT index
    * DISTRIBUTED (keys shuffle by Hudi's key-hash group mapping; each
    * index group's HFiles are read once cluster-wide) — ZERO snapshot
    * scans, IO proportional to batch keys — and matching becomes GLOBAL
    * (key alone: upstream's record-index semantics with
    * `hoodie.record.index.update.partition.path=false`, so a row arriving
    * with a changed partition value updates the record at its CURRENT
    * location). An ADVERTISED index is trusted — the same contract every
    * writer of an index-advertising table must honor (this one does on
    * every commit); a structurally unreadable or hash-misaligned index
    * REFUSES the write loudly rather than falling back: the snapshot
    * probe has DIFFERENT (non-global) matching semantics, and a silent
    * downgrade would e.g. make a keys-only global delete match nothing.
    * Non-indexed tables probe the snapshot pruned to (key, partition,
    * file name): non-global, column-pruned, shuffle bounded by table
    * keys + batch keys. Returns (locations (__key, __part, __fid),
    * global?).
    */
  private def probeLocations(
      spark: SparkSession,
      basePath: String,
      t: HudiTable,
      keyed: DataFrame): (DataFrame, Boolean) = {
    if (graft.table.RecordIndex.isAvailable(t.config)) {
      // an ADVERTISED record index is trusted (the same contract the
      // read side's latest-snapshot plans apply: every writer of an
      // index-advertising table must maintain it — this writer does)
      try {
        import spark.implicits._
        val (_, entries) = graft.table.RecordIndex.lookupDistributed(
          basePath, keyed.select("__key").distinct().as[String],
          spark.sessionState.newHadoopConf())
        indexProbes.incrementAndGet()
        return (entries.toDF().select(col("key").as("__key"),
          col("partitionPath").as("__part"), col("fileId").as("__fid")), true)
      } catch {
        case e: IllegalStateException => throw new UnsupportedOperationException(
          "hudi-graft: the table advertises a record_index this writer cannot probe " +
            s"(${e.getMessage}) — refusing rather than silently downgrading to the " +
            "non-global snapshot probe (a keys-only delete would match nothing)", e)
      }
    }
    snapshotProbes.incrementAndGet()
    (spark.read.format("hudi-graft").load(basePath).select(
      col(MetaField.RecordKey).as("__key"),
      col(MetaField.PartitionPath).as("__part"),
      fidFromFileName.as("__fid")), false)
  }

  /** Join the batch against probe locations: global probes match on the
    * key alone and OVERRIDE the incoming partition with the record's
    * current location for matched rows.
    */
  private def joinLocations(keyed: DataFrame, index: DataFrame, global: Boolean): DataFrame =
    if (global)
      keyed.join(index.withColumnRenamed("__part", "__locpart"), Seq("__key"), "left")
        .withColumn("__part",
          when(col("__fid").isNotNull, col("__locpart")).otherwise(col("__part")))
        .drop("__locpart")
    else keyed.join(index, Seq("__key", "__part"), "left")

  /** Columns eligible for column_stats maintenance: the wrapper types
    * the MDT-subset schema carries (LongWrapper/DateWrapper/
    * StringWrapper). Anything else is SKIPPED — every index tier keys by
    * (file, column) and falls open on a gap, so partial coverage costs a
    * footer read, never a wrong answer.
    */
  private def statColumnsOf(
      schema: org.apache.spark.sql.types.StructType): Seq[org.apache.spark.sql.types.StructField] = {
    import org.apache.spark.sql.types._
    schema.fields.filter(f =>
      !f.name.startsWith("__") && !MetaField.all.contains(f.name) &&
        (f.dataType == LongType || f.dataType == DateType || f.dataType == StringType)).toSeq
  }

  /** Build [[ColumnStatsMaintenance.FileColStats]] entries from the
    * staging pass's per-file aggregates (all-null columns skip — no
    * bounds to record, absence fails open).
    */
  private def colStatsEntries(
      files: Seq[(String, String, String, Long, Long)],
      fileStats: Map[(String, String), Seq[(String, Any, Any, Long)]],
      stagedSchema: org.apache.spark.sql.types.StructType)
      : Seq[ColumnStatsMaintenance.FileColStats] = {
    import org.apache.spark.sql.types._
    def dateDays(v: Any): Any = v match {
      case d: java.sql.Date => Int.box(d.toLocalDate.toEpochDay.toInt)
      case ld: java.time.LocalDate => Int.box(ld.toEpochDay.toInt)
      case other => other
    }
    for {
      (p, fid, rel, rows, _) <- files
      stats <- fileStats.get((p, fid)).toSeq
      (colName, mn, mx, nc) <- stats
      if mn != null && mx != null
    } yield {
      val wrapper = stagedSchema(colName).dataType match {
        case LongType => "LongWrapper"
        case DateType => "DateWrapper"
        case StringType => "StringWrapper"
        case other => throw new IllegalStateException(s"unexpected stat type $other")
      }
      ColumnStatsMaintenance.FileColStats(p, rel.substring(rel.lastIndexOf('/') + 1),
        colName, wrapper, dateDays(mn), dateDays(mx), rows, nc)
    }
  }

  /** Supported type widenings on write (the pairs the read side upcasts
    * when resolving older files under a newer commit schema).
    */
  private def widens(table: org.apache.spark.sql.types.DataType,
      incoming: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (table, incoming) match {
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }
  }

  /** Project `df` onto the (possibly evolved) target data columns:
    * existing columns upcast to the target type, ADDED columns
    * null-fill — how carried/before-image rows of an evolving upsert
    * reach the commit's new schema.
    */
  private def alignTo(
      df: DataFrame,
      target: Seq[org.apache.spark.sql.types.StructField]): Seq[org.apache.spark.sql.Column] =
    target.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }

  /** File-group id from a `_hoodie_file_name` value: base files are
    * `{fid}_{token}_{ts}.ext`, MOR log rows carry the log's own name
    * `.{fid}_{ts}.log.{v}_{token}` — strip the leading dot, take
    * everything before the first '_' (fileIds contain no underscore).
    */
  private[write] def fidOfFileName: org.apache.spark.sql.Column = fidFromFileName

  private def fidFromFileName: org.apache.spark.sql.Column =
    substring_index(regexp_replace(col(MetaField.FileName), "^\\.", ""), "_", 1)

  /** Deterministic UUID-shaped fileId for a fresh group (the driver-side
    * twin of [[routeFresh]]'s md5 expression — kept bit-identical, spec-
    * asserted).
    */
  def freshFileId(instant: String, part: String, bucket: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$instant/$part/$bucket".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
      s"${h.substring(16, 20)}-${h.substring(20, 32)}-0"
  }

  /** Upsert routing: probe the snapshot's (key, partition → fileId),
    * rewrite matched groups (carried rows keep their commit stamps,
    * incoming rows win and stamp the new instant), hash-route unmatched
    * keys to fresh groups. Returns (staged rows, per-fid update counts,
    * no replacements, per-fid prevCommit, per-fid cdc sidecar). With
    * `cdcEnabled`, each rewritten group also gets a `-cdc` sidecar log
    * file holding the exact (before, after) images of its updates —
    * written DISTRIBUTED (one task buffers at most its groups' change
    * volume), so CDC readers later serve this commit with IO
    * proportional to the cdc bytes and past the cleaner horizon.
    */
  private def routeUpsert(
      spark: SparkSession,
      basePath: String,
      t: HudiTable,
      keyed: DataFrame,
      instant: String,
      opts: Options,
      cdcMode: Option[String]
  ): Routed = {
    val (index, global) = probeLocations(spark, basePath, t, keyed)
    val routed = joinLocations(keyed, index, global).persist()
    locally {
      val matched = routed.filter(col("__fid").isNotNull)
      // DISTINCT touched groups: bounded by table file count, never keys
      val perFid = matched.groupBy("__fid").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val touched = perFid.keySet
      val freshPart = routeFresh(routed.filter(col("__fid").isNull).drop("__fid"),
        instant, opts)
      if (touched.isEmpty)
        return Routed(freshPart, newKeys = Some(freshPart), retained = Seq(routed))

      // prevCommit per rewritten group = the base instant of the slice
      // being rewritten (the metadata CDC's savepoint guard verifies)
      val prevCommits = t.fsView.slicesAsOf(instant)
        .filter(sl => touched.contains(sl.fileId))
        .map(sl => sl.fileId -> sl.commitTimestamp).toMap

      // stored rows project onto the commit's (possibly EVOLVED) data
      // schema: widened columns upcast, added columns null-fill
      val targetFields = keyed.schema.fields
        .filterNot(f => Set("__key", "__part").contains(f.name)).toSeq
      val stored0 = spark.read.format("hudi-graft")
        .option("cdc.file.groups", touched.toSeq.sorted.mkString(","))
        .load(basePath)
        .withColumn("__key", col(MetaField.RecordKey))
        .withColumn("__part", col(MetaField.PartitionPath))
        .withColumn("__fid", fidFromFileName)
      val stored = stored0.select((alignTo(stored0, targetFields) ++ Seq(
        col("__key"), col("__part"), col("__fid"), col(MetaField.CommitTime))): _*)
      // carried: stored rows not overwritten — keep their commit stamp
      val dataCols = keyed.columns.filterNot(Set("__key", "__part").contains)
      val carried = stored
        .join(matched.select("__key", "__part"), Seq("__key", "__part"), "left_anti")
        .select((dataCols.map(col) ++ Seq(col("__key"), col("__part"), col("__fid"),
          col(MetaField.CommitTime))): _*)
      val updated = matched
        .withColumn(MetaField.CommitTime, lit(instant))
        .select((dataCols.map(col) ++ Seq(col("__key"), col("__part"), col("__fid"),
          col(MetaField.CommitTime))): _*)
      val fresh = freshPart
        .select((dataCols.map(col) ++ Seq(col("__key"), col("__part"), col("__fid"),
          col(MetaField.CommitTime))): _*)
      val sidecars = cdcMode match {
        case None => Map.empty[String, (String, Long)]
        case Some(m) => writeCdcSidecars(spark, basePath, stored, matched, dataCols,
          instant, t.config.timelineTimezone, deletes = false, mode = m)
      }
      Routed(carried.unionByName(updated).unionByName(fresh),
        updateCounts = perFid, prevCommits = prevCommits, cdcFiles = sidecars,
        newKeys = Some(freshPart), retained = Seq(routed))
    }
  }

  /** Delete routing (upstream's `delete` operation): incoming rows name
    * the keys to REMOVE. Matched groups rewrite with the surviving rows
    * only (carried commit stamps preserved); a group losing every row
    * still writes an EMPTY base-file version (`requiredGroups`) so the
    * deletion is visible. Unmatched keys are no-ops. With CDC enabled,
    * each rewritten group's sidecar carries `d` records (before = the
    * stored row, after = null).
    */
  private def routeDelete(
      spark: SparkSession,
      basePath: String,
      t: HudiTable,
      keyed: DataFrame,
      instant: String,
      cdcMode: Option[String]
  ): Routed = {
    val snap = spark.read.format("hudi-graft").load(basePath)
    val (index, global) = probeLocations(spark, basePath, t, keyed)
    val matched = (if (global)
      keyed.select("__key").distinct().join(index, Seq("__key"), "inner")
    else keyed.select("__key", "__part")
      .join(index, Seq("__key", "__part"), "inner")).persist()
    locally {
      val perFid = matched.groupBy("__fid").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val touched = perFid.keySet
      val dataColsAll = snap.columns.filterNot(MetaField.all.contains)
      if (touched.isEmpty)
        return Routed(LogScanEmpty.staged(spark, snap, dataColsAll),
          retained = Seq(matched))
      val slices = t.fsView.slicesAsOf(instant).filter(sl => touched.contains(sl.fileId))
      val prevCommits = slices.map(sl => sl.fileId -> sl.commitTimestamp).toMap
      val required = slices.map(sl => sl.fileId -> sl.partitionPath).toMap
      val stored = spark.read.format("hudi-graft")
        .option("cdc.file.groups", touched.toSeq.sorted.mkString(","))
        .load(basePath)
        .withColumn("__key", col(MetaField.RecordKey))
        .withColumn("__part", col(MetaField.PartitionPath))
        .withColumn("__fid", fidFromFileName)
      val survivors = stored
        .join(matched.select("__key", "__part"), Seq("__key", "__part"), "left_anti")
        .select((dataColsAll.map(col) ++ Seq(col("__key"), col("__part"), col("__fid"),
          col(MetaField.CommitTime))): _*)
      val sidecars = cdcMode match {
        case None => Map.empty[String, (String, Long)]
        case Some(m) => writeCdcSidecars(spark, basePath, stored, matched, dataColsAll,
          instant, t.config.timelineTimezone, deletes = true, mode = m)
      }
      Routed(survivors, deleteCounts = perFid, prevCommits = prevCommits,
        cdcFiles = sidecars, requiredGroups = required,
        deletedKeys = Some(matched.select("__key")), retained = Seq(matched))
    }
  }

  /** MOR upsert routing (deltacommit): matched keys append as ONE avro
    * data block per touched file group onto the group's latest slice —
    * full meta-prefixed rows stamped with the new instant, so the MOR
    * merge's overwrite-with-latest picks them over the base rows —
    * while unmatched keys route to fresh parquet base-file groups
    * (upstream writes MOR inserts as base files too). Log naming follows
    * the read side's association rule: v6 names carry the target slice's
    * BASE instant, v8+ the delta's own instant (completion from the
    * timeline). Scale shape: the probe is the same column-pruned key
    * join as COW, the log emission repartitions change rows by file
    * group (each task buffers at most its groups' change volume), and
    * the driver collects only (fileId → path, bytes) for write stats.
    */
  private def routeMorUpsert(
      spark: SparkSession,
      basePath: String,
      t: HudiTable,
      keyed: DataFrame,
      instant: String,
      opts: Options
  ): Routed = {
    val (index, global) = probeLocations(spark, basePath, t, keyed)
    val routed = joinLocations(keyed, index, global).persist()
    locally {
      val matched = routed.filter(col("__fid").isNotNull)
      val fresh = routeFresh(routed.filter(col("__fid").isNull).drop("__fid"), instant, opts)
      val dataCols = keyed.columns.filterNot(Set("__key", "__part").contains)
      val logs = writeMorLogs(spark, basePath, t, matched, dataCols, instant, deletes = false)
      if (logs.isEmpty)
        return Routed(fresh, newKeys = Some(fresh), retained = Seq(routed))
      val touched = logs.map(_.fileId).toSet
      val prevCommits = t.fsView.slicesAsOf(instant)
        .filter(sl => touched.contains(sl.fileId))
        .map(sl => sl.fileId -> sl.commitTimestamp).toMap
      Routed(fresh,
        updateCounts = logs.map(l => l.fileId -> l.rows).toMap,
        prevCommits = prevCommits, logWrites = logs, newKeys = Some(fresh),
        retained = Seq(routed))
    }
  }

  /** MOR delete routing (deltacommit): matched keys append as ONE delete
    * block per touched group — (key, partition, null-ordering) triples,
    * so the merge's commit-time tiebreak removes the row (M3's
    * event-time-zero semantics). Unmatched keys are no-ops; no base
    * files are written at all.
    */
  private def routeMorDelete(
      spark: SparkSession,
      basePath: String,
      t: HudiTable,
      keyed: DataFrame,
      instant: String
  ): Routed = {
    val snap = spark.read.format("hudi-graft").load(basePath)
    val (index, global) = probeLocations(spark, basePath, t, keyed)
    val matched = (if (global)
      keyed.select("__key").distinct().join(index, Seq("__key"), "inner")
    else keyed.select("__key", "__part")
      .join(index, Seq("__key", "__part"), "inner")).persist()
    val dataColsAll = snap.columns.filterNot(MetaField.all.contains)
    val logs = writeMorLogs(spark, basePath, t, matched, dataColsAll, instant, deletes = true)
    val empty = LogScanEmpty.staged(spark, snap, dataColsAll)
    if (logs.isEmpty) return Routed(empty, retained = Seq(matched))
    val touched = logs.map(_.fileId).toSet
    val prevCommits = t.fsView.slicesAsOf(instant)
      .filter(sl => touched.contains(sl.fileId))
      .map(sl => sl.fileId -> sl.commitTimestamp).toMap
    Routed(empty,
      deleteCounts = logs.map(l => l.fileId -> l.rows).toMap,
      prevCommits = prevCommits, logWrites = logs,
      deletedKeys = Some(matched.select("__key")), retained = Seq(matched))
  }

  /** Distributed MOR log emission: `rows` (carrying __key/__part/__fid)
    * repartition by file group; each task writes one log file per group
    * it holds — an avro data block of full meta-prefixed records
    * (upserts) or a delete block of (key, partition, null) triples — and
    * the driver collects only per-file stats. The per-group name/version
    * map is driver-computed from the fs view (bounded by table file
    * count) and broadcast.
    */
  private def writeMorLogs(
      spark: SparkSession,
      basePath: String,
      t: HudiTable,
      matched: DataFrame,
      dataCols: Array[String],
      instant: String,
      deletes: Boolean): Seq[LogWrite] = {
    // per touched group: (partition, log name ts, next version) — v6 logs
    // name the slice's BASE instant (the association key FileGroup
    // .assemble anchors on), v8+ their OWN instant
    val v8 = t.config.tableVersion >= 8
    val naming = t.fsView.slicesAsOf(instant).map { sl =>
      sl.fileId -> ((sl.partitionPath,
        if (v8) instant else sl.commitTimestamp,
        sl.logFiles.map(_.version).maxOption.getOrElse(0) + 1))
    }.toMap
    val token = Token
    val conf = new graft.util.SerializableConf(spark.sessionState.newHadoopConf())
    val bcNaming = spark.sparkContext.broadcast(naming)

    val entries: Array[(String, String, Long, Long)] = if (deletes) {
      matched.select(col("__fid"), col("__part"), col("__key"))
        .repartition(col("__fid")).rdd.mapPartitions { it =>
          val byFid = it.toVector.groupBy(_.getString(0))
          byFid.iterator.map { case (fid, rs) =>
            val (part, nameTs, version) = bcNaming.value.getOrElse(fid,
              throw new IllegalStateException(
                s"hudi-graft: file group $fid (from the key probe) has no slice as of " +
                  "this write — the record index points at uncommitted state"))
            val name = s".${fid}_$nameTs.log.${version}_$token"
            val dir = if (part.isEmpty) new Path(basePath) else new Path(basePath, part)
            val fs = dir.getFileSystem(conf.value)
            val header = org.apache.avro.SchemaBuilder.record("graft_delete_header")
              .fields().endRecord()
            val out = new java.io.DataOutputStream(fs.create(new Path(dir, name), false))
            // orderingVal 0 = upstream DeleteRecord's default: the merge's
            // event-time-zero rule then compares on COMMIT TIME only, so
            // this delete beats every earlier row version regardless of
            // its precombine value (a null here would sort LOWEST and the
            // delete would never win)
            val triples = rs.sortBy(_.getString(2))
              .map(r => (r.getString(2), r.getString(1), 0: Any))
            try graft.log.LogFileWriter.deleteBlock(out, instant, header, triples)
            finally out.close()
            val rel = if (part.isEmpty) name else s"$part/$name"
            (fid, rel, rs.size.toLong, fs.getFileStatus(new Path(dir, name)).getLen)
          }
        }.collect()
    } else {
      // full meta-prefixed record rows, stamped with the NEW instant so
      // the MOR merge's (ordering, commit-time) comparison picks them
      val metaRows = matched.select(
        col("__fid"),
        col("__part"),
        struct(
          lit(instant).as(MetaField.CommitTime) +:
            concat_ws("_", lit(instant), col("__fid"), col("__key"))
              .as(MetaField.CommitSeqno) +:
            col("__key").as(MetaField.RecordKey) +:
            col("__part").as(MetaField.PartitionPath) +:
            lit("").as(MetaField.FileName) +:
            dataCols.map(col).toIndexedSeq: _*).as("__row"))
      val rowStruct = metaRows.schema("__row").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      // fail on the DRIVER with a clear message — the avro log-block
      // bridge covers the flat type matrix only (nested struct/map
      // columns would otherwise throw per-task)
      try graft.log.SparkToAvro.toAvroSchema(rowStruct, "graft_mor_record")
      catch {
        case e: IllegalArgumentException => throw new UnsupportedOperationException(
          s"hudi-graft: MOR log append cannot avro-encode this schema (${e.getMessage}); " +
            "only flat column types are supported for MOR upserts", e)
      }
      val rowSchemaJson = rowStruct.json
      metaRows.repartition(col("__fid")).rdd.mapPartitions { it =>
        val target = org.apache.spark.sql.types.DataType.fromJson(rowSchemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val avro = graft.log.SparkToAvro.toAvroSchema(target, "graft_mor_record")
        val byFid = it.toVector.groupBy(_.getString(0))
        byFid.iterator.map { case (fid, rs) =>
          val (part, nameTs, version) = bcNaming.value.getOrElse(fid,
            throw new IllegalStateException(
              s"hudi-graft: file group $fid (from the key probe) has no slice as of " +
                "this write — the record index points at uncommitted state"))
          val name = s".${fid}_$nameTs.log.${version}_$token"
          val dir = if (part.isEmpty) new Path(basePath) else new Path(basePath, part)
          val fs = dir.getFileSystem(conf.value)
          val recs = rs.sortBy(_.getStruct(2).getString(2))
            .map { r =>
              val rec = graft.log.SparkToAvro.toRecord(r.getStruct(2), target, avro)
              // real Hudi stamps log records with the LOG file's name
              // (HoodieAppendHandle) — also what keeps the writer's own
              // (key -> fileId) snapshot probe routable after a log merge
              rec.put(MetaField.FileName, name)
              rec
            }
          val out = new java.io.DataOutputStream(fs.create(new Path(dir, name), false))
          try graft.log.LogFileWriter.avroDataBlock(out, instant, avro, recs)
          finally out.close()
          val rel = if (part.isEmpty) name else s"$part/$name"
          (fid, rel, rs.size.toLong, fs.getFileStatus(new Path(dir, name)).getLen)
        }
      }.collect()
    }
    entries.toSeq.sortBy(_._1).map { case (fid, rel, rows, bytes) =>
      val (part, _, _) = naming(fid)
      LogWrite(part, fid, rel, rows, bytes)
    }
  }

  /** Zero-row staged frame with the routing columns (delete of only
    * unmatched keys = an empty commit).
    */
  private object LogScanEmpty {
    def staged(spark: SparkSession, snap: DataFrame, dataCols: Array[String]): DataFrame = {
      import org.apache.spark.sql.types._
      val schema = StructType(
        dataCols.map(c => snap.schema(c)) ++ Seq(
          StructField("__key", StringType), StructField("__part", StringType),
          StructField("__fid", StringType), StructField(MetaField.CommitTime, StringType)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** Distributed `-cdc` sidecar emission for an upsert's rewritten
    * groups: (before = the stored row being replaced, after = the
    * incoming winner) image pairs repartition by file group; each task
    * writes one log file per group it holds (buffering bounded by the
    * group's CHANGE volume, never table size) with a single CdcData
    * block, and the driver collects only (fileId → path, bytes) for the
    * commit metadata's cdcStats. Fresh-key inserts route to new groups
    * and need no images (readers serve them one-sided from the base
    * file); upserts produce no deletes.
    */
  private def writeCdcSidecars(
      spark: SparkSession,
      basePath: String,
      stored: DataFrame,
      matched: DataFrame,
      dataCols: Array[String],
      instant: String,
      timelineTimezone: String,
      deletes: Boolean,
      mode: String): Map[String, (String, Long)] = {
    val b = stored.select(col("__key"), col("__part"), col("__fid"),
      struct(dataCols.map(col).toIndexedSeq: _*).as("__before"))
    val images =
      if (deletes)
        // delete images: before = the stored row, after = null
        b.join(matched.select("__key", "__part"), Seq("__key", "__part"), "left_semi")
          .select(col("__fid"), col("__part"), col("__key"), col("__before"),
            lit(null).cast(b.schema("__before").dataType).as("__after"))
      else {
        val a = matched.select(col("__key"), col("__part"),
          struct(dataCols.map(col).toIndexedSeq: _*).as("__after"))
        b.join(a, Seq("__key", "__part"), "inner")
          .select(col("__fid"), col("__part"), col("__key"), col("__before"), col("__after"))
      }
    val dataSchema = org.apache.spark.sql.types.StructType(
      images.schema("__before").dataType.asInstanceOf[org.apache.spark.sql.types.StructType])
    val schemaJson = dataSchema.json
    val conf = new graft.util.SerializableConf(
      spark.sessionState.newHadoopConf())
    // the TABLE's timeline timezone, matching CdcRead's inference stamps —
    // persisted and inferred feeds must hash-identically on non-UTC tables
    val tsMs = graft.core.Timestamps.timelineToEpochMillis(instant, timelineTimezone).toString
    val token = Token
    val cdcMode = mode
    val entries = images.repartition(col("__fid")).rdd.mapPartitions { it =>
      val target = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      // block record shape per the table's supplemental logging mode
      // (upstream HoodieCDCUtils.schemaBySupplementalLoggingMode)
      val cdcAvro = cdcMode match {
        case "data_before_after" =>
          graft.log.SparkToAvro.cdcAvroSchema(target, "graft_write_record")
        case "data_before" =>
          graft.log.SparkToAvro.cdcAvroSchemaDataBefore(target, "graft_write_record")
        case "op_key_only" =>
          graft.log.SparkToAvro.cdcAvroSchemaOpKeyOnly("graft_write_record")
        case other => throw new IllegalArgumentException(
          s"hudi-graft: unknown cdc supplemental logging mode '$other'")
      }
      val byFid = it.toVector.groupBy(r => (r.getString(0), r.getString(1)))
      val op = if (deletes) "d" else "u"
      byFid.iterator.map { case ((fid, part), rows) =>
        val recs = rows.sortBy(_.getString(2)).map { r =>
          cdcMode match {
            case "data_before_after" =>
              graft.log.SparkToAvro.cdcRecord(cdcAvro, target, op, tsMs,
                Some(r.getStruct(3)), Option(r.getStruct(4)))
            case "data_before" =>
              graft.log.SparkToAvro.cdcPartialRecord(cdcAvro, target, op,
                r.getString(2), Some(r.getStruct(3)))
            case _ =>
              graft.log.SparkToAvro.cdcPartialRecord(cdcAvro, target, op,
                r.getString(2), None)
          }
        }
        val name = s".${fid}_$instant.log.1_$token${graft.fs.LogFile.CdcSuffix}"
        val dir = if (part.isEmpty) new Path(basePath) else new Path(basePath, part)
        val fs = dir.getFileSystem(conf.value)
        val out = new java.io.DataOutputStream(fs.create(new Path(dir, name), true))
        try graft.log.LogFileWriter.cdcDataBlock(out, instant, cdcAvro, recs)
        finally out.close()
        val rel = if (part.isEmpty) name else s"$part/$name"
        (fid, rel, fs.getFileStatus(new Path(dir, name)).getLen)
      }
    }.collect()
    entries.map { case (fid, rel, len) => fid -> (rel, len) }.toMap
  }

  // ---- physical write -------------------------------------------------------

  /** One Spark job: repartition by (partition, fileGroup), stage via
    * partitionBy so each group lands as exactly one parquet file, then
    * rename into Hudi base-file names. Returns
    * (partition, fileId, relPath, rows, bytes) per file.
    */
  private[write] def writeStaged(
      spark: SparkSession,
      fs: FileSystem,
      base: Path,
      staged: DataFrame,
      instant: String,
      requiredGroups: Map[String, String] = Map.empty): Seq[(String, String, String, Long, Long)] =
    writeStagedWithStats(spark, fs, base, staged, instant, requiredGroups, Nil)._1

  /** As [[writeStaged]], additionally computing EXACT per-(file, column)
    * min/max/nullCount for `statColumns` in the SAME metadata pass that
    * counts staged rows — the column_stats maintenance input, one extra
    * aggregation over a scan the writer already runs.
    */
  private[write] def writeStagedWithStats(
      spark: SparkSession,
      fs: FileSystem,
      base: Path,
      staged: DataFrame,
      instant: String,
      requiredGroups: Map[String, String],
      statColumns: Seq[org.apache.spark.sql.types.StructField])
      : (Seq[(String, String, String, Long, Long)],
         Map[(String, String), Seq[(String, Any, Any, Long)]]) = {
    val dataCols = staged.columns
      .filterNot(c => c.startsWith("__") || c == MetaField.CommitTime)
    val fileName = concat(col("__fid"), lit(s"_${Token}_$instant.parquet"))
    // staging dir values carry a "p:" prefix so an EMPTY partition value
    // (unpartitioned table) survives partitionBy, which would otherwise
    // render it as the hive null-sentinel directory and collide with a
    // genuine null-partition value
    val withMeta = staged.select(
      col(MetaField.CommitTime) +:
        concat_ws("_", col(MetaField.CommitTime), col("__fid"), col("__key"))
          .as(MetaField.CommitSeqno) +:
        col("__key").as(MetaField.RecordKey) +:
        col("__part").as(MetaField.PartitionPath) +:
        fileName.as(MetaField.FileName) +:
        (dataCols.map(col) ++ Seq(
          concat(lit("p:"), col("__part")).as("__p"), col("__fid").as("__f"))): _*)
    val tmp = new Path(base, s".hoodie/.temp/$instant")
    withMeta
      .repartition(col("__p"), col("__f"))
      .write.partitionBy("__p", "__f").mode("overwrite").parquet(tmp.toString)
    // row counts per file from the staging footers — a metadata-only
    // columnar count, no data re-read; a zero-row staging (delete of
    // only-unmatched keys, or all rows routed to requiredGroups) leaves
    // no partition dirs at all
    val hasStaged = fs.exists(tmp) &&
      fs.listStatus(tmp).exists(_.getPath.getName.startsWith("__p="))
    val aggExprs = count(lit(1)).as("__cnt") +: statColumns.zipWithIndex.flatMap {
      case (f, i) => Seq(
        min(col(f.name)).as(s"__mn$i"), max(col(f.name)).as(s"__mx$i"),
        sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"__nc$i"))
    }
    val aggRows =
      if (!hasStaged) Array.empty[org.apache.spark.sql.Row]
      else spark.read.parquet(tmp.toString)
        .groupBy("__p", "__f").agg(aggExprs.head, aggExprs.tail: _*).collect()
    val counts = aggRows
      .map(r => (r.getString(0).stripPrefix("p:"), r.getString(1)) -> r.getLong(2)).toMap
    // per-file column stats: (partition, fid) -> (column, min, max, nullCount)
    val colStats: Map[(String, String), Seq[(String, Any, Any, Long)]] = aggRows.map { r =>
      val key = (r.getString(0).stripPrefix("p:"), r.getString(1))
      key -> statColumns.zipWithIndex.map { case (f, i) =>
        (f.name, r.get(3 + i * 3), r.get(4 + i * 3), r.getLong(5 + i * 3))
      }.toSeq
    }.toMap
    val out = Seq.newBuilder[(String, String, String, Long, Long)]
    for (pDir <- fs.listStatus(tmp).toSeq.filter(_.isDirectory).sortBy(_.getPath.getName)) {
      val part = decodeStagedValue(pDir.getPath.getName.stripPrefix("__p=")).stripPrefix("p:")
      for (fDir <- fs.listStatus(pDir.getPath).toSeq.filter(_.isDirectory)
          .sortBy(_.getPath.getName)) {
        val fid = decodeStagedValue(fDir.getPath.getName.stripPrefix("__f="))
        val file = fs.listStatus(fDir.getPath).map(_.getPath)
          .find(_.getName.startsWith("part-"))
          .getOrElse(throw new IllegalStateException(s"no staged file under $fDir"))
        val name = s"${fid}_${Token}_$instant.parquet"
        val dir = if (part.isEmpty) base else new Path(base, part)
        fs.mkdirs(dir)
        val dest = new Path(dir, name)
        if (!fs.rename(file, dest))
          throw new java.io.IOException(s"hudi-graft: rename $file -> $dest failed")
        val rel = if (part.isEmpty) name else s"$part/$name"
        out += ((part, fid, rel, counts.getOrElse((part, fid), 0L),
          fs.getFileStatus(dest).getLen))
      }
    }
    fs.delete(new Path(base, ".hoodie/.temp"), true)
    val written = out.result()
    // rewritten groups that lost EVERY row still need a base-file version
    // (schema-only parquet) — without one their old slice stays visible
    // and the deleted rows resurrect
    val missing = requiredGroups.filterNot { case (fid, _) => written.exists(_._2 == fid) }
    val emptied = missing.toSeq.sortBy(_._1).map { case (fid, part) =>
      val fileSchema = org.apache.spark.sql.types.StructType(
        withMeta.schema.fields.filterNot(f => f.name == "__p" || f.name == "__f"))
      val name = s"${fid}_${Token}_$instant.parquet"
      val dir = if (part.isEmpty) base else new Path(base, part)
      val tmp2 = new Path(base, s".hoodie/.temp/empty_$fid")
      // ONE empty partition (emptyRDD has zero → no task → no file): the
      // single write task emits a schema-only parquet file
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq.empty[org.apache.spark.sql.Row], 1), fileSchema)
        .write.mode("overwrite").parquet(tmp2.toString)
      val part0 = fs.listStatus(tmp2).map(_.getPath).find(_.getName.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(
          s"empty base-file staging produced no part file under $tmp2"))
      fs.mkdirs(dir)
      fs.rename(part0, new Path(dir, name))
      fs.delete(tmp2, true)
      val rel = if (part.isEmpty) name else s"$part/$name"
      (part, fid, rel, 0L, fs.getFileStatus(new Path(dir, name)).getLen)
    }
    if (emptied.nonEmpty) fs.delete(new Path(base, ".hoodie/.temp"), true)
    (written ++ emptied, colStats)
  }

  /** partitionBy HIVE-escapes directory values (ExternalCatalogUtils
    * .escapePathName: '%', '=', ':' → %XX, but '+' and spaces stay
    * literal — NOT URL encoding, whose decode would corrupt '+' to a
    * space); unescape with Spark's own inverse.
    */
  private def decodeStagedValue(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(v)

  // ---- metadata --------------------------------------------------------------

  private def writeTableProperties(
      fs: FileSystem,
      base: Path,
      opts: Options,
      keyFields: Seq[String],
      partFields: Seq[String],
      precombine: Option[String],
      tableType: String,
      renderComplex: Boolean,
      hiveStyle: Boolean,
      createSchema: Option[String] = None): Unit = {
    fs.mkdirs(new Path(base, ".hoodie"))
    val keygen =
      if (renderComplex) "org.apache.hudi.keygen.ComplexKeyGenerator"
      else if (partFields.nonEmpty) "org.apache.hudi.keygen.SimpleKeyGenerator"
      else "org.apache.hudi.keygen.NonpartitionedKeyGenerator"
    val sb = new StringBuilder
    sb ++= s"hoodie.table.name=${opts.tableName(base.getName)}\n"
    sb ++= s"hoodie.table.type=$tableType\n"
    sb ++= "hoodie.table.version=6\n"
    sb ++= "hoodie.timeline.layout.version=1\n"
    sb ++= s"hoodie.table.recordkey.fields=${keyFields.mkString(",")}\n"
    precombine.foreach(f => sb ++= s"hoodie.table.precombine.field=$f\n")
    if (partFields.nonEmpty)
      sb ++= s"hoodie.table.partition.fields=${partFields.mkString(",")}\n"
    sb ++= s"hoodie.table.keygenerator.class=$keygen\n"
    sb ++= s"hoodie.datasource.write.hive_style_partitioning=$hiveStyle\n"
    sb ++= "hoodie.datasource.write.partitionpath.urlencode=false\n"
    sb ++= "hoodie.populate.meta.fields=true\n"
    if (opts.cdcEnabled) {
      sb ++= "hoodie.table.cdc.enabled=true\n"
      sb ++= s"hoodie.table.cdc.supplemental.logging.mode=${opts.cdcLoggingMode}\n"
    }
    // CREATE TABLE records the declared schema — what serves reads (and
    // the first INSERT's schema check) while the table has zero commits.
    // java.util.Properties values may contain ':'/'=' unescaped; the
    // avro JSON is single-line so no continuation escaping is needed
    createSchema.foreach(s => sb ++= s"hoodie.table.create.schema=$s\n")
    val out = fs.create(new Path(base, ".hoodie/hoodie.properties"), true)
    out.write(sb.result().getBytes("UTF-8")); out.close()
  }

  private def writeTimeline(
      fs: FileSystem,
      base: Path,
      instant: String,
      operation: String,
      files: Seq[(String, String, String, Long, Long)],
      routed: Routed,
      commitSchema: org.apache.spark.sql.types.StructType,
      tableVersion: Int,
      timelineTimezone: String,
      isMor: Boolean): Unit = {
    val updateCounts = routed.updateCounts
    val deleteCounts = routed.deleteCounts
    val replaced = routed.replaced
    val prevCommits = routed.prevCommits
    val cdcFiles = routed.cdcFiles
    val action = if (replaced.nonEmpty || operation == "insert_overwrite_table")
      "replacecommit" else if (isMor) "deltacommit" else "commit"
    // v8+ targets keep their timeline under .hoodie/timeline and complete
    // with a {request}_{completion} name (timeline layout v2)
    val timelineDir =
      if (tableVersion >= 8) new Path(base, ".hoodie/timeline") else new Path(base, ".hoodie")
    fs.mkdirs(timelineDir)
    def touch(name: String): Unit = fs.create(new Path(timelineDir, name), true).close()
    touch(s"$instant.$action.requested")
    touch(s"$instant.$action.inflight")
    // base-file entries plus (MOR) log-file entries, merged per partition
    val baseEntries = files.map { case (p, fid, rel, rows, bytes) =>
      val upd = updateCounts.getOrElse(fid, 0L)
      val del = deleteCounts.getOrElse(fid, 0L)
      // rewritten groups receive no fresh keys under this routing, so
      // their non-update rows are CARRIED, not inserted
      val ins = if (updateCounts.contains(fid) || deleteCounts.contains(fid)) 0L else rows
      val prev = prevCommits.getOrElse(fid, "null")
      val cdc = cdcFiles.get(fid).map { case (cdcRel, cdcLen) =>
        s""","cdcStats":{"${escape(cdcRel)}":$cdcLen}""" }.getOrElse("")
      (p, fid,
        s"""{"fileId":"$fid","path":"${escape(rel)}","partitionPath":"${escape(p)}","prevCommit":"$prev",""" +
          s""""numWrites":$rows,"numUpdateWrites":$upd,"numInserts":$ins,""" +
          s""""numDeletes":$del,"fileSizeInBytes":$bytes,"totalWriteBytes":$bytes$cdc}""")
    }
    val logEntries = routed.logWrites.map { lw =>
      val upd = updateCounts.getOrElse(lw.fileId, 0L)
      val del = deleteCounts.getOrElse(lw.fileId, 0L)
      val prev = prevCommits.getOrElse(lw.fileId, "null")
      (lw.partition, lw.fileId,
        s"""{"fileId":"${lw.fileId}","path":"${escape(lw.relPath)}","partitionPath":"${escape(lw.partition)}",""" +
          s""""prevCommit":"$prev","numWrites":${lw.rows},"numUpdateWrites":$upd,""" +
          s""""numInserts":0,"numDeletes":$del,"fileSizeInBytes":${lw.bytes},""" +
          s""""totalWriteBytes":${lw.bytes}}""")
    }
    val stats = (baseEntries ++ logEntries).groupBy(_._1).toSeq.sortBy(_._1).map {
      case (p, entries) =>
        s""""${escape(p)}":${entries.sortBy(_._2).map(_._3).mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    val rep =
      if (action != "replacecommit") ""
      else {
        val m = replaced.toSeq.sortBy(_._1).map { case (p, fids) =>
          s""""${escape(p)}":${fids.toSeq.sorted.map(f => s""""$f"""").mkString("[", ",", "]")}"""
        }.mkString("{", ",", "}")
        s""","partitionToReplaceFileIds":$m"""
      }
    // the writer's DATA schema, like real Hudi — but only for the flat
    // type matrix the avro bridge covers; readers fall back to footers
    val schemaJson = scala.util.Try(
      graft.log.SparkToAvro.toAvroSchema(commitSchema, "graft_write_record").toString).toOption
    val extra = schemaJson.map(s =>
      s""","extraMetadata":{"schema":"${escape(s)}"}""").getOrElse("")
    val opType = operation.toUpperCase(java.util.Locale.ROOT)
    val body =
      s"""{"partitionToWriteStats":$stats$rep$extra,"compacted":false,"operationType":"$opType"}"""
    val completedName =
      if (tableVersion >= 8) s"${instant}_${completionNow(instant, timelineTimezone)}.$action"
      else s"$instant.$action"
    val out = fs.create(new Path(timelineDir, completedName), true)
    out.write(body.getBytes("UTF-8")); out.close()
  }

  // ---- shared write-side primitives (one copy; HudiCleaner reuses) -------

  /** Millisecond-resolution timeline instant (the 17-digit form),
    * strictly after `floor` — wall clock, bumped on collision like real
    * Hudi's instant generation. Also the v8 completion-timestamp rule
    * (completion is just "an instant strictly after the request").
    */
  private[write] def instantAfter(floor: String, timelineTimezone: String = "UTC"): String = {
    // the TABLE's timeline timezone (hoodie.table.timeline.timezone), not
    // hard-coded UTC: readers interpret timeline instants in that zone
    // (Timestamps.timelineToEpochMillis), so a LOCAL-timezone table
    // appended with UTC stamps would skew CDC ts_ms by the zone offset
    val zone =
      if (timelineTimezone.equalsIgnoreCase("LOCAL")) java.time.ZoneId.systemDefault()
      else java.time.ZoneOffset.UTC
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")
      .withZone(zone)
    val now = fmt.format(java.time.Instant.now())
    if (now > floor) now else (normalizeTo17(floor).toLong + 1).toString
  }

  private[write] def completionNow(request: String, timelineTimezone: String = "UTC"): String =
    instantAfter(request, timelineTimezone)

  /** JSON string escaping incl. control chars — a partition value (user
    * data) carrying a newline must not produce an unparseable commit file.
    */
  private[write] def escapeJson(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb ++= "\\\\"
      case '"' => sb ++= "\\\""
      case '\b' => sb ++= "\\b"
      case '\f' => sb ++= "\\f"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < 0x20 => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb.result()
  }

  private def escape(s: String): String = escapeJson(s)

  private def nextInstant(latest: Option[String], timelineTimezone: String): String =
    instantAfter(latest.getOrElse("0"), timelineTimezone)

  private def normalizeTo17(ts: String): String =
    if (ts.length >= 17) ts.take(17) else ts.padTo(17, '0')

  /** Option resolution: upstream `hoodie.datasource.write.*` spellings
    * with short aliases.
    */
  private final class Options(options: Map[String, String]) {
    private val lower = options.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    private def get(keys: String*): Option[String] =
      keys.iterator.flatMap(k => lower.get(k)).nextOption().map(_.trim).filter(_.nonEmpty)
    def recordKeyFields: Option[Seq[String]] =
      get("hoodie.datasource.write.recordkey.field", "recordkey.field", "primarykey")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).filter(_.nonEmpty)
    /** Spark passes `df.write.partitionBy(...)` to a V1 provider as the
      * `__partition_columns` option (DataSourceUtils.PARTITIONING_COLUMNS_KEY,
      * a JSON string array) — silently ignoring it would write the table
      * unpartitioned; map it onto the hoodie partition-path spelling and
      * refuse a conflict with an explicit hoodie option.
      */
    private def partitionByColumns: Seq[String] =
      lower.get("__partition_columns").map { json =>
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
        (0 until node.size()).map(node.get(_).asText()).toSeq
      }.getOrElse(Nil)
    def partitionPathFields: Option[Seq[String]] = {
      val explicit = get("hoodie.datasource.write.partitionpath.field", "partitionpath.field")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).filter(_.nonEmpty)
      partitionByColumns match {
        case Nil => explicit
        case cols =>
          if (explicit.exists(_ != cols)) throw new IllegalArgumentException(
            s"hudi-graft: .partitionBy(${cols.mkString(",")}) conflicts with " +
              s"hoodie.datasource.write.partitionpath.field=${explicit.get.mkString(",")}")
          Some(cols)
      }
    }
    def hiveStylePartitioning: Boolean =
      get("hoodie.datasource.write.hive_style_partitioning")
        .exists(_.equalsIgnoreCase("true"))
    def precombineField: Option[String] =
      get("hoodie.datasource.write.precombine.field", "precombine.field", "precombinefield")
    def operation: String =
      get("hoodie.datasource.write.operation", "operation").getOrElse("upsert")
        .toLowerCase(java.util.Locale.ROOT)
    def tableType: String =
      get("hoodie.datasource.write.table.type", "hoodie.table.type")
        .getOrElse("COPY_ON_WRITE").toUpperCase(java.util.Locale.ROOT)
    def tableName(default: String): String =
      get("hoodie.table.name").getOrElse(default)
    def maxFileBytes: Long =
      get("hoodie.parquet.max.file.size").map(_.toLong).getOrElse(120L << 20)
    def cdcEnabled: Boolean =
      get("hoodie.table.cdc.enabled").exists(_.equalsIgnoreCase("true"))
    def cdcLoggingMode: String =
      get("hoodie.table.cdc.supplemental.logging.mode")
        .getOrElse("data_before_after").toLowerCase(java.util.Locale.ROOT)
  }
}
