package graft.write

import graft.core.MetaField
import graft.table.HudiTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MOR COMPACTION — the table service that folds a file group's log
  * files into a fresh base-file version, so read-optimized queries catch
  * up and the MOR merge cost resets. Mirrors real Hudi's flow: a
  * `compaction.requested` plan (the slice set, JSON), an inflight
  * marker, the merged rewrite, and a completed `commit` whose metadata
  * carries `"compacted":true` + `operationType COMPACT` — the spelling
  * every reader in this repo (and upstream) already treats as a LOGICAL
  * NO-OP: rows keep their original `_hoodie_commit_time`, so
  * incremental ranges spanning the compaction surface nothing for it
  * and CDC skips it outright (CdcRead.isLogicalNoOp).
  *
  * Scale shape: the merged read is the ordinary distributed MOR scan
  * restricted to the compacting groups (one task per slice, the same
  * merge the snapshot path runs); each group stages as exactly ONE new
  * parquet base via the writer's partitionBy staging, and the driver
  * renames + writes metadata — O(#compacted groups) namenode ops, no
  * data through the driver. The planning collect is bounded by file
  * groups with logs, never rows.
  */
object HudiCompaction {

  final case class CompactionStats(
      instant: Option[String],
      compacted: Seq[(String, String)]) // (partition, fileId)

  /** Compact every file group whose LATEST slice carries log files.
    * Returns the compaction instant (None = nothing to compact).
    */
  def compact(spark: SparkSession, basePath: String): CompactionStats = {
    val t = HudiTable(spark, basePath)
    if (!t.config.isMor)
      throw new UnsupportedOperationException(
        "hudi-graft compaction: not a MERGE_ON_READ table — COW groups have no logs")
    val fs = new Path(basePath).getFileSystem(spark.sessionState.newHadoopConf())
    val latest = t.timeline.latestCommitTimestamp.getOrElse(
      return CompactionStats(None, Nil))
    val candidates = t.fsView.slicesAsOf(latest).filter(_.hasLogFiles)
    if (candidates.isEmpty) return CompactionStats(None, Nil)
    val fids = candidates.map(_.fileId).sorted
    val prevCommits = candidates.map(sl => sl.fileId -> sl.commitTimestamp).toMap
    val instant = HudiWriter.instantAfter(latest, t.config.timelineTimezone)

    // plan-first (crash-safe like the cleaner): the requested marker
    // names every compacting slice before anything is written
    val timelineDir = t.timeline.dir
    def touch(name: String, content: String = ""): Unit = {
      val o = fs.create(new Path(timelineDir, name), true)
      o.write(content.getBytes("UTF-8")); o.close()
    }
    val planJson = candidates.sortBy(_.fileId).map { sl =>
      s"""{"fileId":"${sl.fileId}","partitionPath":"${HudiWriter.escapeJson(sl.partitionPath)}",""" +
        s""""baseInstantTime":"${sl.commitTimestamp}","logFiles":${sl.logFiles.size}}"""
    }.mkString("""{"operations":[""", ",", "]}")
    touch(s"$instant.compaction.requested", planJson)
    touch(s"$instant.compaction.inflight")

    // merged view of exactly the compacting groups — per-row commit
    // stamps PRESERVED (that is what keeps the compaction invisible to
    // incremental/CDC consumers)
    val merged = spark.read.format("hudi-graft")
      .option("cdc.file.groups", fids.mkString(","))
      .load(basePath)
    val staged = merged
      .withColumn("__key", col(MetaField.RecordKey))
      .withColumn("__part", col(MetaField.PartitionPath))
      .withColumn("__fid", HudiWriter.fidOfFileName)
      .drop(MetaField.all.filterNot(_ == MetaField.CommitTime): _*)
    // requiredGroups: a group whose logs deleted EVERY row still writes
    // an empty base version — without it the old slice (and its
    // read-optimized resurrections) would stay the latest
    val files = HudiWriter.writeStaged(spark, fs, new Path(basePath), staged, instant,
      candidates.map(sl => sl.fileId -> sl.partitionPath).toMap)

    // files-MDT maintenance (same contract as data commits)
    val mdtParts = t.config.getOrElse("hoodie.table.metadata.partitions", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    if (mdtParts.contains("files"))
      MdtMaintenance.appendFiles(basePath, spark.sessionState.newHadoopConf(), instant,
        files.map { case (p, _, rel, _, bytes) =>
          (p, rel.substring(rel.lastIndexOf('/') + 1), bytes)
        })

    // completed COMMIT with compacted:true — the logical-no-op spelling
    val stats = files.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, fsz) =>
      val entries = fsz.sortBy(_._2).map { case (_, fid, rel, rows, bytes) =>
        s"""{"fileId":"$fid","path":"${HudiWriter.escapeJson(rel)}",""" +
          s""""partitionPath":"${HudiWriter.escapeJson(p)}",""" +
          s""""prevCommit":"${prevCommits.getOrElse(fid, "null")}","numWrites":$rows,""" +
          s""""numUpdateWrites":0,"numInserts":0,"numDeletes":0,"fileSizeInBytes":$bytes}"""
      }.mkString("[", ",", "]")
      s""""${HudiWriter.escapeJson(p)}":$entries"""
    }.mkString("{", ",", "}")
    val completedName =
      if (t.config.tableVersion >= 8)
        s"${instant}_${HudiWriter.completionNow(instant, t.config.timelineTimezone)}.commit"
      else s"$instant.commit"
    touch(completedName,
      s"""{"partitionToWriteStats":$stats,"compacted":true,"operationType":"COMPACT"}""")
    CompactionStats(Some(instant), files.map(f => (f._1, f._2)))
  }
}
