package graft.sources

import graft.core.{MetaField, Timestamps}
import graft.core.HoodieInstant
import graft.table.{HudiTable, LogScan}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, StringType}

/** Inferred change-data-capture over a Hudi table: upstream Spark-Hudi's
  * `cdc` incremental format — one `(op, ts_ms, before, after)` row per
  * record CHANGED by each commit in `(start, end]`, with full before/after
  * images — computed by per-commit file-group diffs instead of decoded
  * writer CDC blocks (reference parity: the reference reads CDC log blocks
  * when `hoodie.table.cdc.enabled` writers produce them, log/mod.rs — but
  * most tables don't enable supplemental logging, and Hudi itself INFERS
  * images from before/after file slices in that case; this implements the
  * inference).
  *
  * Semantics (per commit `c` with predecessor `p`, over only the file
  * groups `c` touched — from its commit metadata's partitionToWriteStats):
  *
  *  - `u`: key present in both the as-of-`p` and as-of-`c` reads with the
  *    after-image's `_hoodie_commit_time == c` (rows merely CARRIED into a
  *    rewritten/merged file keep their old commit stamp — Hudi preserves
  *    per-record commit times on COW copy — and drop out, exactly the
  *    unchanged-row exclusion upstream's CDC infer path applies);
  *  - `i`: key absent as of `p` (its commit stamp is `c` by construction);
  *  - `d`: key present as of `p`, absent as of `c` — a MOR delete block or
  *    a COW rewrite that dropped the row;
  *  - `ts_ms`: the commit instant as epoch millis (upstream's column), a
  *    STRING like upstream's schema.
  *
  * The join key is `(_hoodie_record_key, _hoodie_partition_path)`: with a
  * NON-global index the same record key legally lives in several
  * partitions, and a commit touching both copies must diff each against
  * its own partition's before image, never cross-pair them.
  *
  * Images are structs of the DATA columns — the exact writer meta columns
  * ([[MetaField.all]]) excluded, so a user column that merely shares the
  * prefix (the conventional `_hoodie_is_deleted` soft-delete flag) stays
  * in the images.
  *
  * Scale shape: each commit plans TWO snapshot reads restricted to its
  * touched file groups (`cdc.file.groups` — slice-level, not partition-
  * level, so IO is proportional to changed groups), joined on the record
  * key. The join is FULL OUTER — semantically required (inserts are
  * after-only rows, deletes before-only) — which Spark cannot broadcast;
  * AQE picks a shuffled-hash join whose shuffle is bounded by the
  * commit's change volume, never table size. Diffs union across the
  * bounded commit range. Work ∝ change volume × commits, never table
  * size. Table-service instants that change no logical rows — pure
  * clustering, MOR compaction — are skipped outright (their diffs are
  * provably empty, and a compaction's touched set is every compacted
  * group: reading it would be table-sized IO for zero rows).
  *
  * Insert-overwrite (a NON-clustering replacecommit): the before-image is
  * the REPLACED groups read as of the predecessor (from the instant's
  * `partitionToReplaceFileIds`, reference replace handling:
  * timeline/mod.rs:302-320) unioned with any rewritten pre-existing
  * groups; the after-image is the NEW groups from its write stats. A key
  * present only in the replaced groups surfaces as `d`, a fresh key as
  * `i`, a re-written key as `u` — work ∝ replaced+new volume, never table
  * size. `delete_partition` (replaced groups, no new ones) degenerates to
  * an all-`d` diff against an empty after side. (A writer that preserved
  * OLD commit stamps across an overwrite would have its value-identical
  * rows excluded by the carried-row filter — consistent with clustering,
  * the one real case that preserves stamps, whose diff is empty.)
  *
  * Refusals (loud, never a silently wrong feed):
  *  - `populate.meta.fields=false` tables: the inference keys and stamps
  *    on meta columns, which such tables null out;
  *  - a non-clustering replacecommit whose metadata LACKS the
  *    `partitionToReplaceFileIds` field entirely (corruption / unknown
  *    writer): treating it as replacing nothing would drop its deletes;
  *  - a first in-range commit whose predecessor has been ARCHIVED off the
  *    active timeline when older instants exist (an unreadable archive
  *    counts: the guard fails closed): its before state is not
  *    resolvable, so its updates would surface as inserts and its deletes
  *    vanish — narrow the range instead;
  *  - a commit that rewrote a PRE-EXISTING group (its write stat records
  *    a prevCommit) — or a replacecommit whose REPLACED groups — whose
  *    previous slice no longer exists as of the predecessor: the CLEANER
  *    horizon; inferring from a half-cleaned view would misreport those
  *    updates (or overwrite-deletes) as inserts.
  */
object CdcRead {

  /** Upstream Spark-Hudi CDC column names. */
  private val OpCol = "op"
  private val TsCol = "ts_ms"

  /** The `(op, ts_ms, before, after)` schema for a table's data columns —
    * computable from metadata alone (no data read), which is what the
    * streaming source needs at source-construction time.
    */
  def cdcSchema(hudi: HudiTable): StructType = {
    val metaCols = (MetaField.all :+ MetaField.Operation).toSet
    val imageType = StructType(
      hudi.tableSchema.fields.filterNot(f => metaCols.contains(f.name)).toIndexedSeq)
    StructType(Seq(
      StructField(OpCol, StringType, nullable = false),
      StructField(TsCol, StringType, nullable = false),
      StructField("before", imageType, nullable = true),
      StructField("after", imageType, nullable = true)))
  }

  /** Table-service instants that change no logical rows: pure clustering
    * replacecommits, MOR compaction commits, and log-compaction
    * deltacommits (all rewrite bytes while preserving per-record commit
    * stamps — their inferred diff is empty by construction, and their
    * touched set spans every serviced group, so diffing would be
    * table-sized IO for zero rows).
    */
  private def isLogicalNoOp(hudi: HudiTable)(i: HoodieInstant): Boolean = {
    lazy val op = hudi.timeline.commitMetadata(i).path("operationType").asText("")
    (i.action == "replacecommit" &&
      (op.equalsIgnoreCase("cluster") || op.equalsIgnoreCase("clustering"))) ||
      (i.action == "commit" &&
        (op.equalsIgnoreCase("compact") || op.equalsIgnoreCase("compaction"))) ||
      (i.action == "deltacommit" &&
        (op.equalsIgnoreCase("log_compact") || op.equalsIgnoreCase("logcompaction") ||
          op.equalsIgnoreCase("log_compaction")))
  }

  def changes(
      spark: SparkSession,
      basePath: String,
      start: Option[String],
      end: Option[String],
      // read options of the issuing handle (timestamp-keygen type,
      // ordering field, ... — configs Hudi writers do not persist); they
      // ride every delegated DSv2 read so an optioned HudiTable handle's
      // cdc() merges with the SAME semantics as its snapshot()
      readOptions: Map[String, String] = Map.empty): DataFrame = {
    val hudi =
      if (readOptions.isEmpty) HudiTable(spark, basePath)
      else HudiTable(spark, basePath, readOptions)
    if (!hudi.config.populatesMetaFields)
      throw new UnsupportedOperationException(
        "cdc: inference keys on _hoodie_record_key and stamps on _hoodie_commit_time, " +
          "which hoodie.populate.meta.fields=false tables null out — a diff would " +
          "misreport every row; CDC is unavailable on such tables")
    val tz = hudi.config.timelineTimezone
    val s = start.map(Timestamps.normalize(_, tz))
    val e = end.map(Timestamps.normalize(_, tz))
      .orElse(hudi.timeline.latestCommitTimestamp)

    val noOp = isLogicalNoOp(hudi) _
    val inRange = hudi.timeline.instantsBetween(s, e)

    // the optional writer meta column (_hoodie_operation, behind
    // hoodie.allow.operation.metadata.field) is physical-write metadata
    // too — images carry DATA columns only
    val metaCols = (MetaField.all :+ MetaField.Operation).toSet
    val dataFields = hudi.tableSchema.fields.filterNot(f => metaCols.contains(f.name))
    val dataCols = dataFields.map(f => col(f.name))
    val schema = cdcSchema(hudi)

    // predecessor lookup over the ACTIVE timeline; a first in-range commit
    // with archived older instants has no resolvable before state (the
    // archive records metadata, not the cleaned file slices) — refuse
    // rather than misreport its updates as inserts
    val allTs = hudi.timeline.completedInstants.map(_.timestamp).distinct.sorted

    // one diff per distinct in-range commit timestamp (multi-writer: a
    // same-instant commit+deltacommit pair merges its touched groups; a
    // same-instant table-service sibling drops out WITHOUT taking the
    // data instants with it)
    val commits = inRange.filterNot(noOp)
      .groupBy(_.timestamp).toSeq.sortBy(_._1)
    if (commits.isEmpty)
      return LogScan.emptyDf(spark, schema)

    val perCommit = commits.map { case (c, instants) =>
      val written = instants.flatMap(i =>
        hudi.timeline.touchedFileGroups(i).valuesIterator.flatten).distinct.sorted
      // insert-overwrite / delete_partition: the groups this commit
      // REPLACED hold its before-image (and its logical deletes). A
      // non-clustering replacecommit whose metadata LACKS the
      // partitionToReplaceFileIds field entirely (corruption, or a writer
      // this inference doesn't know) would silently drop every logical
      // delete — fail closed; real writers record the field even when
      // the overwritten partition was empty (an empty map)
      for (i <- instants if i.action == "replacecommit")
        if (!hudi.timeline.commitMetadata(i).path("partitionToReplaceFileIds").isObject)
          throw new UnsupportedOperationException(
            s"cdc: replacecommit $c carries no partitionToReplaceFileIds in its metadata — " +
              "the groups it logically deleted cannot be resolved, so an inferred diff " +
              "would silently miss them; narrow the range to end before it")
      val replaced = instants.flatMap(i =>
        hudi.timeline.replacedFileGroups(i).valuesIterator.flatten).distinct.sorted
      if (written.isEmpty && replaced.isEmpty) LogScan.emptyDf(spark, schema)
      else {
        val prev = allTs.takeWhile(_ < c).lastOption
        // an unreadable archive fails CLOSED (treated as "older instants
        // exist"): the guard exists to prevent a silently wrong feed, so
        // an IO error must not disarm it
        if (prev.isEmpty &&
          scala.util.Try(hudi.timeline.archivedInstants.nonEmpty).getOrElse(true))
          throw new UnsupportedOperationException(
            s"cdc: commit $c is the oldest ACTIVE instant but older instants exist in the " +
              "archived timeline (or it is unreadable) — its before state is not resolvable, " +
              "so its updates would misreport as inserts and its deletes vanish; start the " +
              "range at or after it")
        // cleaner-horizon guard: the commit's own write stats record a
        // prevCommit per touched group, and a replacecommit names the
        // groups it replaced; any group that PRE-EXISTED (either way)
        // must still have a slice as of `prev`, or the cleaner has
        // removed the before state and the diff would misreport its
        // updates (or overwrite-deletes) as inserts — refuse, never
        // infer from a half-cleaned view
        val preExisting = instants
          .flatMap(i => hudi.timeline.touchedGroupsPreExisting(i))
          .groupMapReduce(_._1)(_._2)(_ || _)
          .collect { case (fid, true) => fid }.toSet ++ replaced
        if (preExisting.nonEmpty) {
          val covered = prev
            .map(p => hudi.fsView.slicesAsOf(p).map(_.fileId).toSet)
            .getOrElse(Set.empty[String])
          val missing = (preExisting -- covered).toSeq.sorted
          if (missing.nonEmpty)
            throw new UnsupportedOperationException(
              s"cdc: commit $c rewrote or replaced file groups ${missing.mkString(", ")} " +
                s"whose previous versions no longer exist as of ${prev.getOrElse("<none>")} " +
                "(cleaned, or metadata inconsistency) — their before images are not " +
                "resolvable; start the range at or after this commit")
        }
        def readAsOf(ts: String, groups: Seq[String]): DataFrame =
          spark.read.format("hudi-graft")
            .options(readOptions)
            .option("as.of.timestamp", ts)
            .option("cdc.file.groups", groups.mkString(","))
            .load(basePath)
        // after-image: the new groups only (a replacecommit's replaced
        // groups are R4-excluded from the as-of-c view anyway); a
        // delete_partition writes none, so its after side is empty.
        // before-image: new ∪ replaced — groups born at c simply don't
        // resolve as of prev, so over-inclusion costs nothing
        val after =
          if (written.nonEmpty) readAsOf(c, written)
          else LogScan.emptyDf(spark, hudi.tableSchema)
        val beforeGroups = (written ++ replaced).distinct.sorted
        val before = prev.map(readAsOf(_, beforeGroups))
          .getOrElse(LogScan.emptyDf(spark, after.schema))
        val b = before.select(col(MetaField.RecordKey).as("__bk"),
          col(MetaField.PartitionPath).as("__bp"),
          struct(dataCols.toIndexedSeq: _*).as("before"))
        val a = after.select(col(MetaField.RecordKey).as("__ak"),
          col(MetaField.PartitionPath).as("__ap"),
          col(MetaField.CommitTime).as("__ac"),
          struct(dataCols.toIndexedSeq: _*).as("after"))
        val tsMs = Timestamps.timelineToEpochMillis(c, tz).toString
        b.join(a, col("__bk") === col("__ak") && col("__bp") === col("__ap"), "full_outer")
          // keep: deletes (no after row) + rows the commit actually
          // stamped; carried-over rows with older stamps are unchanged
          .filter(col("__ak").isNull || col("__ac") === lit(c))
          .select(
            when(col("__bk").isNull, lit("i"))
              .when(col("__ak").isNull, lit("d"))
              .otherwise(lit("u")).as(OpCol),
            lit(tsMs).as(TsCol),
            col("before"),
            col("after"))
      }
    }
    // balanced tree, not a left-deep reduce: a long commit range (backfill
    // replay) must not hand the analyzer an O(commits)-deep plan
    graft.util.BalancedUnion(perCommit)
  }
}
