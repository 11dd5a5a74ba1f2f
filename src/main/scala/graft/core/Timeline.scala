package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import scala.jdk.CollectionConverters._

/** A timeline instant — one transaction-log entry.
  *
  * Filename formats (crates/core/src/timeline/instant.rs:107-183):
  *  - pre-v8:        `{timestamp}.{action}[.{state}]`
  *  - v8+ completed: `{requestedTs}_{completedTs}.{action}`
  *
  * `timestamp` is the request timestamp (ordering + identity);
  * `completionTimestamp` only exists for v8+ completed instants.
  */
final case class HoodieInstant(
    timestamp: String,
    completionTimestamp: Option[String],
    action: String,
    state: String
) {
  def isCompleted: Boolean = state == HoodieInstant.Completed
  /** Timeline filename this instant was parsed from. */
  def fileName: String = {
    val tsPart = completionTimestamp.fold(timestamp)(c => s"${timestamp}_$c")
    val suffix = state match {
      case HoodieInstant.Completed => action
      case HoodieInstant.Inflight => if (action == "commit") "inflight" else s"$action.inflight"
      case s => s"$action.$s"
    }
    s"$tsPart.$suffix"
  }
}

object HoodieInstant {
  val Completed = "completed"
  val Inflight = "inflight"
  val Requested = "requested"
  /** Actions the reader loads (commit/deltacommit/replacecommit). */
  val LoadingActions: Set[String] = Set("commit", "deltacommit", "replacecommit")

  private val tsRe = "^\\d{14}(\\d{3})?$".r

  /** Parse a timeline filename; None when it isn't a loadable instant. */
  def parse(fileName: String): Option[HoodieInstant] = {
    val dot = fileName.indexOf('.')
    if (dot <= 0) return None
    val tsPart = fileName.substring(0, dot)
    val suffix = fileName.substring(dot + 1)
    val (action, state) = suffix.split("\\.", 2) match {
      case Array("inflight") => ("commit", Inflight)
      case Array(a) => (a, Completed)
      case Array(a, st) => (a, st.toLowerCase)
      case _ => return None
    }
    if (!LoadingActions.contains(action)) return None
    tsPart.split("_", 2) match {
      case Array(ts) if tsRe.matches(ts) =>
        Some(HoodieInstant(ts, None, action, state))
      case Array(req, compl) if tsRe.matches(req) && tsRe.matches(compl) && state == Completed =>
        Some(HoodieInstant(req, Some(compl), action, state))
      case _ => None
    }
  }
}

/** The active timeline: completed commit/deltacommit/replacecommit
  * instants loaded from `.hoodie/` (v6) or `.hoodie/<timeline.path>/`
  * (v8+), plus commit-metadata access (crates/core/src/timeline/mod.rs).
  *
  * All of this is driver-side metadata work — file listings and small JSON
  * reads; at 100 TB the cost is bounded by the number of commits, not data.
  */
final class Timeline(
    val basePath: String,
    val config: HoodieConfig,
    hadoopConf: Configuration
) {

  private val mapper = new ObjectMapper()

  private val timelineDir: Path = {
    val hoodie = new Path(basePath, ".hoodie")
    if (config.timelinePath.nonEmpty) new Path(hoodie, config.timelinePath) else hoodie
  }

  /** The active-timeline directory (exposed for the table-open cache's
    * revalidation fingerprint).
    */
  private[graft] def dir: Path = timelineDir

  /** All completed loadable instants, ascending by request timestamp. */
  val completedInstants: Vector[HoodieInstant] = {
    val fs = timelineDir.getFileSystem(hadoopConf)
    if (!fs.exists(timelineDir)) Vector.empty
    else
      fs.listStatus(timelineDir)
        .iterator
        .filter(_.isFile)
        .flatMap(st => HoodieInstant.parse(st.getPath.getName))
        .filter(_.isCompleted)
        .toVector
        .sortBy(i => (i.timestamp, i.action))
  }

  def latestCommitTimestamp: Option[String] = completedInstants.lastOption.map(_.timestamp)

  /** Request timestamps of rollback/restore instants in ANY state, from a
    * raw listing — these are not loadable instants (LoadingActions), but
    * the as-of log pruning ([[graft.fs.FsView]]) must stand down when one
    * exists past the as-of point: a rollback's COMMAND blocks may target
    * earlier instants, and the reference scanner never range-skips
    * command blocks, so dropping the log file that carries them would
    * resurrect rolled-back data. Inflight ones count too — a crashed
    * rollback may have appended its command block before completing.
    */
  lazy val rollbackLikeTimestamps: Vector[String] = {
    val fs = timelineDir.getFileSystem(hadoopConf)
    if (!fs.exists(timelineDir)) Vector.empty
    else
      fs.listStatus(timelineDir)
        .iterator
        .filter(_.isFile)
        .map(_.getPath.getName)
        .flatMap { n =>
          val dot = n.indexOf('.')
          if (dot <= 0) None
          else {
            val ts = n.substring(0, dot).split("_", 2)(0)
            val action = n.substring(dot + 1).split("\\.", 2)(0)
            if ((action == "rollback" || action == "restore") &&
              ts.matches("\\d{14}(\\d{3})?")) Some(ts)
            else None
          }
        }
        .toVector.distinct.sorted
  }

  /** Completed instants whose *request* timestamp is <= `ts`, matching the
    * reference's as-of selection (timeline/mod.rs
    * get_completed_instants_at_or_before: "whose request timestamp is ≤
    * timestamp"). Completion timestamps are reserved for log-file slice
    * association (CompletionTimeView), not visibility selection.
    */
  def instantsAsOf(ts: String): Vector[HoodieInstant] =
    completedInstants.filter(_.timestamp <= ts)

  /** Completed instants in the half-open range `(start, end]` by request ts. */
  def instantsBetween(start: Option[String], end: Option[String]): Vector[HoodieInstant] =
    completedInstants.filter { i =>
      val t = i.timestamp
      start.forall(t > _) && end.forall(t <= _)
    }

  /** T1: instant selection by action set + closed `[start, end]` range
    * (reference TimelineSelector, timeline/selector.rs:138-250).
    */
  def select(
      actions: Set[String],
      start: Option[String] = None,
      end: Option[String] = None
  ): Vector[HoodieInstant] =
    completedInstants.filter { i =>
      actions.contains(i.action) &&
        start.forall(i.timestamp >= _) && end.forall(i.timestamp <= _)
    }

  /** request-ts → completion-ts lookup, memoized: FsView consults this
    * once per listed file, so a linear find would make planning
    * O(files × instants) on the driver (the reference builds the same
    * one-time map, view.rs build_completion_time_map).
    */
  private lazy val completionByRequest: Map[String, Option[String]] = {
    // First-wins: two completed instants can share a request timestamp
    // (e.g. a commit and a clean requested at the same instant time);
    // the pre-memoization code was `completedInstants.find(...)`, which
    // returned the FIRST match in (timestamp, action) order, so the map
    // must preserve that — `.toMap` would silently keep the last.
    val m = scala.collection.mutable.HashMap.empty[String, Option[String]]
    completedInstants.foreach(i => if (!m.contains(i.timestamp)) m(i.timestamp) = i.completionTimestamp)
    m.toMap
  }

  /** Map request-ts → completion-ts for v8+ tables (None entries for v6). */
  def completionTimeOf(requestTs: String): Option[String] =
    completionByRequest.getOrElse(requestTs, None)

  /** Whether `requestTs` corresponds to a completed instant. */
  def isCompletedCommit(requestTs: String): Boolean =
    completionByRequest.contains(requestTs)

  /** Commit metadata for a completed instant, as a JSON tree. v6 writes
    * plain JSON; v8+ writes an Avro object-container file
    * (`HoodieCommitMetadata` with its schema embedded) — detected by the
    * `Obj` magic and rendered through Avro's JSON form so both
    * layouts serve the same accessors.
    */
  private val metadataCache =
    new java.util.concurrent.ConcurrentHashMap[String, JsonNode]()

  def commitMetadata(instant: HoodieInstant): JsonNode =
    metadataCache.computeIfAbsent(instant.fileName, _ => loadCommitMetadata(instant))

  /** One small file read per instant; memoized per Timeline instance — a
    * timeline is a snapshot in time, and planning consults the same
    * instants repeatedly (replaced groups, touched groups, schema).
    */
  private def loadCommitMetadata(instant: HoodieInstant): JsonNode = {
    val fs = timelineDir.getFileSystem(hadoopConf)
    val p = new Path(timelineDir, instant.fileName)
    val bytes = graft.util.ReadFully(fs, p)
    if (bytes.length >= 4 && bytes(0) == 'O' && bytes(1) == 'b' && bytes(2) == 'j' && bytes(3) == 1) {
      import org.apache.avro.file.DataFileStream
      import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
      val reader = new DataFileStream[GenericRecord](
        new java.io.ByteArrayInputStream(bytes), new GenericDatumReader[GenericRecord]())
      try {
        if (reader.hasNext) mapper.readTree(reader.next().toString)
        else mapper.createObjectNode()
      } finally reader.close()
    } else mapper.readTree(bytes)
  }

  /** (partition → fileIds) touched by an instant, from
    * `partitionToWriteStats` in its commit metadata.
    */
  def touchedFileGroups(instant: HoodieInstant): Map[String, Set[String]] = {
    val md = commitMetadata(instant)
    val stats = md.path("partitionToWriteStats")
    if (stats.isMissingNode || !stats.isObject) Map.empty
    else
      stats.properties().asScala.map { e =>
        val ids = e.getValue.elements().asScala
          .flatMap(ws => Option(ws.path("fileId").asText(null)))
          .filter(_ != null).toSet
        e.getKey -> ids
      }.toMap
  }

  /** fileId → whether the instant's write stat records a PREVIOUS file
    * version for that group (`prevCommit` other than Hudi's literal
    * "null" sentinel). A pre-existing group whose before-state the
    * cleaner has since removed is how an inferred per-commit diff goes
    * silently wrong — this is the metadata that lets callers detect it.
    */
  def touchedGroupsPreExisting(instant: HoodieInstant): Map[String, Boolean] =
    touchedGroupsPrevCommit(instant).view.mapValues(_.isDefined).toMap

  /** fileId → the recorded `prevCommit` instant when the group
    * PRE-EXISTED this write (None = fresh group, Hudi's literal "null"
    * sentinel). The VALUE matters, not just its presence: it names the
    * exact slice version the write built on, which is what lets a
    * before-image read verify it is seeing that version and not an older
    * savepoint-retained one the cleaner left behind.
    */
  def touchedGroupsPrevCommit(instant: HoodieInstant): Map[String, Option[String]] = {
    val md = commitMetadata(instant)
    val stats = md.path("partitionToWriteStats")
    if (stats.isMissingNode || !stats.isObject) Map.empty
    else
      stats.properties().asScala.flatMap(_.getValue.elements().asScala).flatMap { ws =>
        Option(ws.path("fileId").asText(null)).filter(_.nonEmpty).map { fid =>
          val prev = ws.path("prevCommit").asText("null")
          fid -> Option(prev).filter(p => p.nonEmpty && !p.equalsIgnoreCase("null"))
        }
      }.toSeq.groupMapReduce(_._1)(_._2)((a, b) => if (a.isDefined) a else b)
  }

  /** fileId → base-path-relative CDC sidecar files written by this
    * instant, from each write stat's `cdcStats` map (upstream
    * HoodieWriteStat.cdcStats; path → bytes — written only when
    * `hoodie.table.cdc.enabled=true`). A group appearing here has its
    * exact change images persisted, so a CDC read can serve it with IO
    * proportional to the cdc bytes instead of inferring from two
    * snapshot reads. Empty for instants without supplemental logging.
    */
  def cdcFiles(instant: HoodieInstant): Map[String, Seq[String]] = {
    val md = commitMetadata(instant)
    val stats = md.path("partitionToWriteStats")
    if (stats.isMissingNode || !stats.isObject) Map.empty
    else
      stats.properties().asScala.flatMap(_.getValue.elements().asScala).flatMap { ws =>
        val fid = ws.path("fileId").asText("")
        val cdc = ws.path("cdcStats")
        if (fid.isEmpty || !cdc.isObject || cdc.isEmpty) None
        else Some(fid -> cdc.properties().asScala.map(_.getKey).toSeq)
      }.toSeq.groupMapReduce(_._1)(_._2)(_ ++ _)
  }

  /** File groups replaced (clustering / insert-overwrite) as of `ts` —
    * excluded from snapshot views (R4, timeline/mod.rs:302-320).
    */
  def replacedFileGroupsAsOf(ts: String): Map[String, Set[String]] =
    mergeReplaced(instantsAsOf(ts))

  /** (partition → fileIds) REPLACED by one instant, from its
    * `partitionToReplaceFileIds` — empty for non-replacecommits. The
    * per-instant view (vs the merged as-of/between forms above) is what
    * inferred CDC needs: an insert-overwrite's before-image is exactly
    * the groups THIS commit replaced, read as of its predecessor
    * (reference replace handling: timeline/mod.rs:302-320).
    */
  def replacedFileGroups(instant: HoodieInstant): Map[String, Set[String]] = {
    if (instant.action != "replacecommit") return Map.empty
    val rep = commitMetadata(instant).path("partitionToReplaceFileIds")
    if (!rep.isObject) Map.empty
    else rep.properties().asScala.map { e =>
      e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSet
    }.toMap
  }

  /** Replaced groups within `(start, end]` for incremental diffs. */
  def replacedFileGroupsBetween(start: Option[String], end: Option[String]): Map[String, Set[String]] =
    mergeReplaced(instantsBetween(start, end))

  private def mergeReplaced(instants: Vector[HoodieInstant]): Map[String, Set[String]] = {
    val acc = scala.collection.mutable.Map.empty[String, Set[String]]
    for (i <- instants if i.action == "replacecommit") {
      val md = commitMetadata(i)
      val rep = md.path("partitionToReplaceFileIds")
      if (rep.isObject) {
        rep.properties().asScala.foreach { e =>
          val ids = e.getValue.elements().asScala.map(_.asText()).toSet
          acc(e.getKey) = acc.getOrElse(e.getKey, Set.empty) ++ ids
        }
      }
    }
    acc.toMap
  }

  /** Latest commit-metadata schema (extraMetadata.schema Avro JSON), if any. */
  def latestSchemaAvro: Option[String] =
    completedInstants.reverseIterator.flatMap { i =>
      val md = commitMetadata(i)
      Option(md.path("extraMetadata").path("schema").asText(null)).filter(_.nonEmpty)
    }.nextOption()

  // ---- T4: archived timeline ---------------------------------------------

  /** Whether archived-timeline reads are enabled
    * (`hoodie.internal.timeline.archived.enabled`, default false —
    * config/internal.rs:60-84).
    */
  def archivedReadEnabled: Boolean =
    config.getOrElse("hoodie.internal.timeline.archived.enabled", "false").toBoolean

  /** v1 archived instants from the archive folder
    * (`hoodie.archivelog.folder`, default `.hoodie/archived`): list the dir
    * and keep files that parse as instants — the reference's V1Archived
    * loader behavior (loader.rs load_archived_instants; its v8 LSM-history
    * reader is an explicit TODO returning empty, mirrored here).
    */
  def archivedInstants: Vector[HoodieInstant] = {
    if (config.tableVersion >= 8) return lsmArchivedInstants(None, None)
    val folder = config.getOrElse("hoodie.archivelog.folder", ".hoodie/archived")
    val dir = if (folder.startsWith(".hoodie")) new Path(basePath, folder)
              else new Path(new Path(basePath, ".hoodie"), folder)
    val fs = dir.getFileSystem(hadoopConf)
    if (!fs.exists(dir)) Vector.empty
    else
      fs.listStatus(dir).iterator
        .filter(_.isFile)
        .flatMap(st => HoodieInstant.parse(st.getPath.getName))
        .filter(_.isCompleted)
        .toVector
        .sortBy(i => (i.timestamp, i.action))
  }

  /** v8+ LSM timeline-history data files — BEYOND the reference, whose
    * V2Archived loader is a TODO returning empty (loader.rs:256). The
    * manifest's parquet files carry `HoodieLSMTimelineInstant` records
    * (apache/hudi LSMTimeline schema: instantTime, completionTime,
    * action, metadata, plan); the three identity columns decode into
    * completed instants. Manifest min/max instants prune files outside
    * the requested range — the LSM tree's point — so a time-filtered
    * selection reads only overlapping files.
    */
  private def lsmArchivedInstants(
      start: Option[String], end: Option[String]): Vector[HoodieInstant] =
    readHistoryManifest() match {
      case None => Vector.empty
      case Some(m) =>
        val historyPath = config.getOrElse("hoodie.timeline.history.path", "history")
        val dir = new Path(timelineDir, historyPath)
        val fs = dir.getFileSystem(hadoopConf)
        m.entries.iterator
          .filter(e => start.forall(e.maxInstant >= _) && end.forall(e.minInstant <= _))
          .flatMap { e =>
            val p = new Path(dir, e.fileName)
            if (!fs.exists(p)) Iterator.empty
            else {
              val (schema, rows) = graft.log.ParquetBlock.decode(graft.util.ReadFully(fs, p))
              def idx(n: String): Option[Int] =
                if (schema.fieldNames.contains(n)) Some(schema.fieldIndex(n)) else None
              (idx("instantTime"), idx("action")) match {
                case (Some(ti), Some(ai)) =>
                  val ci = idx("completionTime")
                  rows.iterator.flatMap { r =>
                    val ts = if (r.isNullAt(ti)) null else r.getString(ti)
                    val act = if (r.isNullAt(ai)) null else r.getString(ai)
                    if (ts == null || act == null) Iterator.empty
                    else {
                      val comp = ci.filterNot(r.isNullAt).map(r.getString)
                      Iterator.single(HoodieInstant(ts, comp, act, HoodieInstant.Completed))
                    }
                  }
                case _ => Iterator.empty // not an instant data file
              }
            }
          }
          .toVector
          .distinctBy(i => (i.timestamp, i.action))
          .sortBy(i => (i.timestamp, i.action))
    }

  /** Time-filtered instant selection including archived history when BOTH
    * gates hold: a time filter is present AND archived reads are enabled
    * (the reference's double-gate, timeline/mod.rs:100-135).
    */
  def selectWithArchived(
      actions: Set[String],
      start: Option[String] = None,
      end: Option[String] = None
  ): Vector[HoodieInstant] = {
    val active = select(actions, start, end)
    val hasTimeFilter = start.isDefined || end.isDefined
    if (!hasTimeFilter || !archivedReadEnabled) active
    else {
      // v8 passes the range down so manifest min/max prunes LSM files
      val loaded =
        if (config.tableVersion >= 8) lsmArchivedInstants(start, end)
        else archivedInstants
      val archived = loaded.filter { i =>
        actions.contains(i.action) &&
          start.forall(i.timestamp >= _) && end.forall(i.timestamp <= _)
      }
      (archived ++ active).distinctBy(i => (i.timestamp, i.action))
        .sortBy(i => (i.timestamp, i.action))
    }
  }

  /** LSM timeline-history manifest for v8+ tables
    * (`.hoodie/<timeline.path>/<history.path>/`): `_version_` names the
    * current `manifest_<v>` JSON (lsm_tree.rs:28-109). None when absent.
    */
  def readHistoryManifest(): Option[TimelineManifest] = {
    val historyPath = config.getOrElse("hoodie.timeline.history.path", "history")
    val dir = new Path(timelineDir, historyPath)
    val fs = dir.getFileSystem(hadoopConf)
    val versionFile = new Path(dir, "_version_")
    if (!fs.exists(versionFile)) return None
    def readString(p: Path): String =
      new String(graft.util.ReadFully(fs, p), "UTF-8")
    try {
      val version = readString(versionFile).trim.toLong
      val node = mapper.readTree(readString(new Path(dir, s"manifest_$version")))
      val entries = node.path("entries").elements().asScala.map { e =>
        ManifestEntry(
          fileName = e.path("file_name").asText(""),
          minInstant = e.path("min_instant").asText(""),
          maxInstant = e.path("max_instant").asText(""),
          level = e.path("level").asInt(0),
          fileSize = e.path("file_size").asLong(0L))
      }.toVector
      Some(TimelineManifest(node.path("version").asLong(version), entries))
    } catch { case _: Exception => None }
  }
}

/** LSM timeline-history manifest model (lsm_tree.rs:28-50): each entry is
  * a compacted timeline file covering an instant range at an LSM level.
  */
final case class TimelineManifest(version: Long, entries: Vector[ManifestEntry])

final case class ManifestEntry(
    fileName: String,
    minInstant: String,
    maxInstant: String,
    level: Int,
    fileSize: Long)
