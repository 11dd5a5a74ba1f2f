package graft.sources

import graft.table.HudiTable

/** Micro-batch admission control shared by the DSv2 stream
  * ([[GraftMicroBatchStream]]) and the V1 CDC source ([[GraftCdcSource]]):
  * given a commit range `(start, target]`, pick the batch end so that at
  * most `countCap` commit timestamps and ~`byteCap` bytes of touched
  * slices admit — the Kafka maxOffsetsPerTrigger / Delta
  * maxFilesPerTrigger shape, so a stream restarted against a long backlog
  * catches up in bounded batches instead of one giant one.
  */
object CommitAdmission {
  import org.apache.spark.sql.connector.read.streaming.{
    CompositeReadLimit, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxFiles}

  /** The configured caps as the `ReadLimit` a source advertises from
    * `getDefaultReadLimit` — commits ride `maxFiles` (the
    * commits-as-files analog), bytes ride `maxBytes`.
    */
  def toReadLimit(commitsPerBatch: Option[Int], maxBytesPerBatch: Option[Long]): ReadLimit =
    (commitsPerBatch.filter(_ > 0), maxBytesPerBatch.filter(_ > 0)) match {
      case (Some(n), Some(b)) =>
        ReadLimit.compositeLimit(Array(ReadLimit.maxFiles(n), ReadLimit.maxBytes(b)))
      case (Some(n), None) => ReadLimit.maxFiles(n)
      case (None, Some(b)) => ReadLimit.maxBytes(b)
      case _ => ReadLimit.allAvailable()
    }

  /** Decode the ENGINE-PASSED limit back into (commit cap, byte cap).
    * Honoring the passed limit — not re-applying the configured caps —
    * is the admission contract (KafkaSource does the same): under
    * Trigger.Once the engine overrides a source's default with
    * `allAvailable()` expecting the WHOLE backlog in one batch, and a
    * source that silently re-capped would strand everything past the
    * first batch until the next manual run. Unknown limit kinds
    * (min/max rows — never advertised here) decode as unbounded.
    */
  def fromReadLimit(limit: ReadLimit): (Option[Int], Option[Long]) = limit match {
    case _: ReadAllAvailable => (None, None)
    case f: ReadMaxFiles => (Some(f.maxFiles()), None)
    case b: ReadMaxBytes => (None, Some(b.maxBytes()))
    case c: CompositeReadLimit =>
      c.getReadLimits.map(fromReadLimit).foldLeft((Option.empty[Int], Option.empty[Long])) {
        case ((n0, b0), (n1, b1)) => (n0.orElse(n1), b0.orElse(b1))
      }
    case _ => (None, None)
  }

  /** The admitted batch end (inclusive). Returns `target` unchanged when
    * no cap applies or the range is empty. Admission works on REQUEST
    * timestamps (the offset unit): instants sharing one timestamp admit
    * together, in timeline order.
    */
  def boundedEnd(
      t: HudiTable,
      startOpt: Option[String],
      target: String,
      commitsPerBatch: Option[Int],
      maxBytesPerBatch: Option[Long]): String = {
    val countCap = commitsPerBatch.filter(_ > 0)
    val byteCap = maxBytesPerBatch.filter(_ > 0)
    if (countCap.isEmpty && byteCap.isEmpty) return target
    val byTs: Vector[(String, Vector[graft.core.HoodieInstant])] =
      t.timeline.instantsBetween(startOpt, Some(target))
        .foldLeft(Vector.empty[(String, Vector[graft.core.HoodieInstant])]) {
          case (acc, i) if acc.nonEmpty && acc.last._1 == i.timestamp =>
            acc.init :+ (i.timestamp, acc.last._2 :+ i)
          case (acc, i) => acc :+ (i.timestamp -> Vector(i))
        }
    // The byte-sizing pass plans slices for its whole candidate window,
    // so an unbounded window against a long backlog would cost
    // O(backlog) planning per micro-batch — O(backlog^2) for the drain.
    // Cap the window when only the byte cap is set (an admission control
    // may always cut EARLIER than its ceiling; the next batch continues
    // from the checkpoint): 1000 commits of sizing per batch keeps the
    // pass planning-sized at any backlog length.
    val sizingWindow = 1000
    val window = (countCap, byteCap) match {
      case (Some(c), Some(_)) => Some(math.min(c, sizingWindow)) // both: sizing still bounded
      case (Some(c), None) => Some(c)
      case (None, Some(_)) => Some(sizingWindow)
      case (None, None) => None
    }
    val capped = window.map(byTs.take).getOrElse(byTs)
    if (capped.isEmpty) return target
    byteCap match {
      case None => capped.last._1
      case Some(cap) =>
        // ONE planning pass sizes every candidate slice as of the widest
        // range; per-commit deltas come from each instant's touched file
        // groups (commit metadata), counted once — a slice touched twice
        // charges its first admitting commit. Sizes are as-of the widest
        // end, so an earlier cut only over-counts (admits fewer bytes
        // than the cap, never more). Unattributable commits (no write
        // stats) charge zero — fail-open, the count cap still bounds them.
        // Known pacing skew (deliberate, safe direction): a commit that
        // touched a group when it was SMALL is charged the group's later,
        // larger as-of-end size, so batches on growing file groups can
        // admit well under the configured bytes. If pacing precision ever
        // matters, charge each commit its own write stats' totalWriteBytes
        // instead — exact per-commit bytes, same single metadata pass.
        val sizes: Map[(String, String), Long] =
          t.fsView.slicesBetween(startOpt, capped.last._1)
            .iterator.map(sl => (sl.partitionPath, sl.fileId) -> sl.totalSize).toMap
        val seen = scala.collection.mutable.Set.empty[(String, String)]
        var acc = 0L
        var admitted = 0
        var stop = false
        for ((_, is) <- capped if !stop) {
          var delta = 0L
          for (i <- is; (p, ids) <- t.timeline.touchedFileGroups(i); id <- ids) {
            val k = (p, id)
            if (seen.add(k)) delta += sizes.getOrElse(k, 0L)
          }
          // always admit the first commit — a single over-cap commit
          // must still make progress as its own batch
          if (admitted > 0 && acc + delta > cap) stop = true
          else { acc += delta; admitted += 1 }
        }
        capped(admitted - 1)._1
    }
  }
}
