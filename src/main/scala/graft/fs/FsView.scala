package graft.fs

import graft.core.{HoodieConfig, Timeline}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import scala.collection.mutable

/** The file-system view: partition discovery, file-group assembly, and
  * slice selection (reference: crates/core/src/table/fs_view.rs +
  * listing.rs). All of this runs on the driver; cost is bounded by file
  * counts, not data size — at 100 TB the listing is the scaling concern,
  * and partition pruning (applied *before* listing partition contents)
  * keeps it proportional to the partitions actually queried.
  */
final class FsView(
    basePath: String,
    config: HoodieConfig,
    timeline: Timeline,
    hadoopConf: Configuration
) {

  private val base = new Path(basePath)
  private val fs = base.getFileSystem(hadoopConf)
  private val layoutV2 = config.tableVersion >= 8

  /** Planning-I/O concurrency (the reference's
    * `hoodie.plan.listing.parallelism`, config/plan.rs:59).
    */
  private val listingParallelism: Int =
    config.getOrElse("hoodie.plan.listing.parallelism", "16").toIntOption.getOrElse(16)

  /** S11: file listings served from the metadata table's `files` partition
    * when enabled (v8+, `files` in `hoodie.table.metadata.partitions`) —
    * one bounded HFile read replaces O(partitions) directory listings.
    * Any failure falls back to storage listing, exactly like the reference
    * (table/mod.rs:494-506).
    */
  private lazy val mdtRecords: Option[Map[String, graft.table.FilesPartitionRecord]] =
    if (!graft.table.MetadataTable.isEnabled(config, basePath)) None
    else
      try {
        val r = graft.table.MetadataTable.filesPartitionRecords(basePath, hadoopConf)
        if (r.isEmpty) None else Some(r)
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Leaf partition paths (relative, "" for non-partitioned): from the
    * MDT's `__all_partitions__` record when available, else discovered by
    * a level-parallel walk of the table dir, skipping dot-dirs like
    * `.hoodie` (listing.rs:40-60): each BFS level lists its directories
    * concurrently, so wall time is O(depth x dirs-per-level / parallelism)
    * instead of one round-trip per directory.
    */
  lazy val partitionPaths: Vector[String] =
    mdtRecords
      .flatMap(_.get(graft.table.FilesPartitionRecord.AllPartitionsKey))
      .map(_.partitionNames)
      .filter(_.nonEmpty)
      .getOrElse(listedPartitionPaths)

  private lazy val listedPartitionPaths: Vector[String] = {
    val out = Vector.newBuilder[String]
    var frontier = Vector((base, ""))
    while (frontier.nonEmpty) {
      val listed = graft.util.Parallel.map(frontier, listingParallelism) {
        case (dir, rel) => (rel, fs.listStatus(dir))
      }
      frontier = listed.flatMap { case (rel, entries) =>
        val subdirs = entries.filter(e => e.isDirectory && !e.getPath.getName.startsWith("."))
        val hasFiles = entries.exists(e => e.isFile && !e.getPath.getName.startsWith(".hoodie_partition"))
        if (subdirs.isEmpty) {
          if (rel.nonEmpty || hasFiles) out += rel
          Vector.empty
        } else {
          // mixed dirs (files + subdirs) only occur for non-partitioned roots
          subdirs.toVector.map(d =>
            (d.getPath, if (rel.isEmpty) d.getPath.getName else s"$rel/${d.getPath.getName}"))
        }
      }
    }
    // listStatus order is filesystem-dependent (raw local FS returns OS
    // order) — sort for deterministic plans
    out.result().sorted
  }

  private val fileGroupCache =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[FileGroup]]()

  /** List + assemble the file groups of one partition, applying the
    * completion-time view: under timeline layout v2 (v8+), files whose
    * commit isn't completed are dropped (listing.rs:70-141). Memoized per
    * FsView instance — a view is a snapshot in time, like its Timeline
    * (the reference caches in its DashMap the same way); streaming builds
    * a fresh view per micro-batch.
    */
  def fileGroups(partitionPath: String): Vector[FileGroup] =
    fileGroupCache.computeIfAbsent(partitionPath, listFileGroups)

  private def listFileGroups(partitionPath: String): Vector[FileGroup] = {
    val dir = if (partitionPath.isEmpty) base else new Path(base, partitionPath)
    // (name, size) pairs from the MDT files record when available, else
    // from a directory listing
    val entries: Iterator[(String, Long)] = mdtRecords.flatMap(_.get(partitionPath)) match {
      case Some(rec) => rec.activeFiles.iterator
      case None =>
        try fs.listStatus(dir).iterator.filter(_.isFile).map(st => (st.getPath.getName, st.getLen))
        catch {
          // With MDT listings active, a partition named in __all_partitions__
          // but lacking a per-partition record may have been cleaned from
          // storage entirely — treat it as empty rather than failing the plan.
          case _: java.io.FileNotFoundException if mdtRecords.isDefined => Iterator.empty
        }
    }
    // a declared format pins the extension; with the key ABSENT the
    // reference dispatches per file extension (base_file/reader.rs,
    // pinned by its extension-fallback test) — accept both data formats
    val baseExts: Set[String] =
      config.get(graft.core.HoodieConfig.BaseFileFormat) match {
        case Some(f) => Set(f.toLowerCase)
        case None => Set("parquet", "lance")
      }
    val bases = mutable.ArrayBuffer.empty[BaseFile]
    val logs = mutable.ArrayBuffer.empty[LogFile]
    entries.foreach { case (name, size) =>
      val path = new Path(dir, name).toString
      if (!name.startsWith(".hoodie_partition")) {
        if (baseExts.exists(e => name.toLowerCase.endsWith("." + e)) && !name.startsWith(".")) {
          // uncommitted-file filtering is layout-v2-only, matching the
          // reference exactly (view.rs:146 should_filter_uncommitted =
          // is_timeline_layout_v2; v6 relies on cleaning, as Hudi v6 does)
          BaseFile.parse(name, path, size).foreach { bf =>
            val completed = timeline.completionTimeOf(bf.commitTimestamp)
            val visible = !layoutV2 || completed.isDefined
            if (visible) bases += bf.copy(completionTimestamp = completed)
          }
        } else if (name.startsWith(".")) {
          LogFile.parse(name, path, size).foreach { lf =>
            val completed = timeline.completionTimeOf(lf.timestamp)
            val visible = !layoutV2 || completed.isDefined
            if (visible) logs += lf.copy(completionTimestamp = completed)
          }
        }
      }
    }
    FileGroup.assemble(partitionPath, bases.toSeq, logs.toSeq)
  }

  /** Snapshot/time-travel slice planning (fs_view.rs:224-252): per surviving
    * partition and non-replaced file group, the slice as of `ts`.
    */
  def slicesAsOf(ts: String, pruner: PartitionInclude = PartitionPruner.trivial): Vector[FileSlice] = {
    val replaced = timeline.replacedFileGroupsAsOf(ts)
    pruneLogsAsOf(collect(pruner, replaced, _.sliceAsOf(ts)), ts)
  }

  /** As-of log pruning (v8+ layouts only): a log file whose request
    * instant is PAST the as-of point contributes nothing to the read —
    * every data/delete block it carries is stamped with that instant and
    * dropped by the reader's InstantRange anyway — so planning can drop
    * the whole file: time travel skips the log bytes instead of parsing
    * and discarding them, and a slice whose logs are ALL later becomes
    * log-free, unlocking the columnar path and aggregate pushdown for
    * as-of reads.
    *
    * Sound only because three gates hold together:
    *  - v8+ log names carry the OWNING deltacommit's request ts (one
    *    commit per file — 1.0 writers never append across commits), so
    *    name-ts > asOf proves every contained data block is out of
    *    range. v6 names carry the BASE instant instead — undecidable
    *    from the name, so v6 never prunes (the read-time range filter
    *    stays authoritative there).
    *  - The read-time range is REQUEST-ts based (InstantRange.upTo), the
    *    same ordering the prune tests — a commit requested before asOf
    *    but completed after stays planned, byte-identical semantics.
    *  - Rollback COMMAND blocks are never range-skipped by the scanner
    *    (they may target earlier instants), so the prune stands down
    *    entirely when any rollback/restore instant — any state — exists
    *    past the as-of point (Timeline.rollbackLikeTimestamps).
    * At the latest snapshot no log is past the as-of point and the scan
    * returns unchanged (zero overhead on the common path).
    */
  private def pruneLogsAsOf(slices: Vector[FileSlice], ts: String): Vector[FileSlice] = {
    if (!layoutV2) return slices
    if (!slices.exists(_.logFiles.exists(_.timestamp > ts))) return slices
    if (timeline.rollbackLikeTimestamps.exists(_ > ts)) return slices
    slices.map { sl =>
      if (sl.logFiles.forall(_.timestamp <= ts)) sl
      else sl.copy(logFiles = sl.logFiles.filter(_.timestamp <= ts))
    }
  }

  /** Incremental slice planning: only file groups touched by commits in
    * `(start, end]` (per commit metadata), sliced as of `end`
    * (table/mod.rs:532-583).
    */
  def slicesBetween(
      start: Option[String],
      end: String,
      pruner: PartitionInclude = PartitionPruner.trivial
  ): Vector[FileSlice] = {
    val touched: Map[String, Set[String]] = {
      val acc = mutable.Map.empty[String, Set[String]]
      for (i <- timeline.instantsBetween(start, Some(end)); (p, ids) <- timeline.touchedFileGroups(i))
        acc(p) = acc.getOrElse(p, Set.empty) ++ ids
      acc.toMap
    }
    val replaced = timeline.replacedFileGroupsBetween(start, Some(end))
    pruneLogsAsOf(collect(pruner, replaced, fg =>
      if (touched.getOrElse(fg.partitionPath, Set.empty).contains(fg.fileId)) fg.sliceAsOf(end)
      else None), end)
  }

  private def collect(
      pruner: PartitionInclude,
      replaced: Map[String, Set[String]],
      pick: FileGroup => Option[FileSlice]
  ): Vector[FileSlice] = {
    val pruned = partitionPaths.filter(pruner.shouldInclude)
    // warm the file-group cache with concurrent per-partition listings
    // (the reference's parallel fs-view population); the flatMap below is
    // then pure in-memory assembly in deterministic partition order
    graft.util.Parallel.map(pruned.filterNot(fileGroupCache.containsKey), listingParallelism)(fileGroups)
    pruned.flatMap { p =>
      val excluded = replaced.getOrElse(p, Set.empty)
      fileGroups(p).filterNot(fg => excluded.contains(fg.fileId)).flatMap(pick(_))
    }
  }
}
