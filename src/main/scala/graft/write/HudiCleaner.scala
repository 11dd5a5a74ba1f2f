package graft.write

import graft.table.HudiTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** KEEP_LATEST_COMMITS cleaner — the table service that reclaims old COW
  * slice versions (real Hudi's default policy). For each file group,
  * every query as of the last `retainCommits` commits must stay
  * servable: slices at or after the horizon commit are kept, plus the
  * latest slice at-or-before it (the one an as-of-horizon read serves);
  * everything older deletes (base file + attached logs). The clean
  * completes as a `<ts>.clean` instant whose JSON records the horizon
  * and the deleted paths, and a files-partition MDT (when advertised)
  * receives matching isDeleted TOMBSTONES in the same breath — a stale
  * files listing would otherwise serve dead paths into scans.
  *
  * SAVEPOINTS pin history (real Hudi's contract): each completed
  * savepoint keeps, per file group, the slice an as-of-savepoint read
  * serves — time travel to the savepoint stays exact forever, while the
  * resulting retained-old-slice layout is exactly what the read side's
  * savepoint-stale guards detect (CDC inference across the gap refuses;
  * persisted CDC keeps serving). Any genuinely PENDING instant refuses
  * fail-closed (a concurrent writer may be about to reference the
  * candidate files).
  *
  * Scale shape: driver-side metadata only — slice maps from the fs view,
  * O(deleted files) namenode deletes, one MDT log block. No data reads.
  * This is deliberately the one DESTRUCTIVE surface in the engine:
  * everything it removes is invisible to snapshot reads by construction,
  * and the read-side cleaner-horizon guards (incremental/CDC refusals)
  * already treat cleaned history as unservable.
  */
object HudiCleaner {

  final case class CleanStats(
      instant: Option[String],
      earliestRetained: Option[String],
      deleted: Seq[(String, String)]) // (partition, fileName)

  def clean(spark: SparkSession, basePath: String, retainCommits: Int): CleanStats = {
    require(retainCommits >= 1, s"retain_commits must be >= 1, got $retainCommits")
    val t = HudiTable(spark, basePath)
    val fs = new Path(basePath).getFileSystem(spark.sessionState.newHadoopConf())
    val timelineDir = t.timeline.dir

    // savepoints PIN history: each one keeps, per file group, the slice
    // an as-of-savepoint read serves (real Hudi's savepoint contract —
    // the resulting retained-old-slice-with-cleaned-intermediates layout
    // is exactly what the CDC savepoint-stale guard detects and refuses
    // to infer across); pending instants may be about to reference the
    // candidates and refuse below
    val rawNames = fs.listStatus(timelineDir).iterator.filter(_.isFile)
      .map(_.getPath.getName).toVector
    val savepoints = rawNames.filter(n =>
      n.endsWith(".savepoint") && n.count(_ == '.') == 1)
      .map(_.stripSuffix(".savepoint").split("_")(0)).sorted
    // PENDING = a requested/inflight marker with NO completed counterpart
    // (completed commits legitimately keep their markers on disk)
    val completedTs = rawNames.iterator
      .filterNot(n => n.endsWith(".requested") || n.endsWith(".inflight"))
      .flatMap(n => n.split("\\.", 2).headOption)
      .map(_.split("_")(0)).toSet
    val pending = rawNames.iterator
      .filter(n => n.endsWith(".requested") || n.endsWith(".inflight"))
      .flatMap(n => n.split("\\.", 2).headOption)
      .filterNot(completedTs.contains).toVector
    if (pending.nonEmpty)
      throw new UnsupportedOperationException(
        s"hudi-graft clean: pending instants exist (${pending.sorted.mkString(", ")}) — a " +
          "concurrent writer may still reference the candidate files; retry when the " +
          "timeline is quiescent")

    val commits = t.timeline.completedInstants.map(_.timestamp).distinct.sorted
    if (commits.size <= retainCommits)
      return CleanStats(None, commits.headOption, Nil)
    val earliestRetained = commits(commits.size - retainCommits)

    val deleted = Vector.newBuilder[(String, String)]
    for (p <- t.fsView.partitionPaths; g <- t.fsView.fileGroups(p)) {
      // keep: everything at/after the horizon's serving slice, plus each
      // savepoint's serving slice — delete the rest
      val keepFrom = g.sliceAsOf(earliestRetained).map(_.commitTimestamp)
      val pinned = savepoints.flatMap(sp => g.sliceAsOf(sp).map(_.commitTimestamp)).toSet
      for ((ts, slice) <- g.slices
          if keepFrom.exists(ts < _) && !pinned.contains(ts)) {
        for (bf <- slice.baseFile) {
          if (fs.delete(new Path(bf.path), false)) deleted += ((p, bf.fileName))
        }
        for (lf <- slice.logFiles) {
          if (fs.delete(new Path(lf.path), false)) deleted += ((p, lf.fileName))
        }
      }
    }
    val removed = deleted.result()

    val instant = nextCleanInstant(commits.last)
    // files-partition MDT: tombstone the removed paths at the SAME
    // instant, before the clean completes
    val mdtParts = t.config.getOrElse("hoodie.table.metadata.partitions", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    if (mdtParts.contains("files") && removed.nonEmpty)
      MdtMaintenance.tombstoneFiles(basePath, spark.sessionState.newHadoopConf(),
        instant, removed)

    val byPartition = removed.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, fsz) =>
      s""""${escape(p)}":${fsz.map(f => s""""${escape(f._2)}"""").mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    val body =
      s"""{"earliestCommitToRetain":"$earliestRetained","totalFilesDeleted":${removed.size},""" +
        s""""partitionToDeletedFiles":$byPartition}"""
    def touch(name: String, content: String = ""): Unit = {
      val o = fs.create(new Path(timelineDir, name), true)
      o.write(content.getBytes("UTF-8")); o.close()
    }
    touch(s"$instant.clean.requested")
    touch(s"$instant.clean.inflight")
    val completed =
      if (t.config.tableVersion >= 8) s"${instant}_${HudiWriter.completionNow(instant)}.clean"
      else s"$instant.clean"
    touch(completed, body)
    CleanStats(Some(instant), Some(earliestRetained), removed)
  }

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def nextCleanInstant(latest: String): String = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")
      .withZone(java.time.ZoneOffset.UTC)
    val now = fmt.format(java.time.Instant.now())
    val floor = (if (latest.length >= 17) latest.take(17) else latest.padTo(17, '0')).toLong + 1
    if (now.toLong > floor) now else floor.toString
  }
}
