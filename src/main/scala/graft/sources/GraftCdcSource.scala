package graft.sources

import graft.core.Timestamps
import graft.table.HudiTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.StructType

/** Streaming CDC (upstream Spark-Hudi's
  * `hoodie.datasource.query.incremental.format=cdc` on `readStream`):
  * offsets are commit timestamps, and each micro-batch emits
  * [[CdcRead]]'s inferred `(op, ts_ms, before, after)` feed for the
  * commits admitted into its range — per-commit diffs ride INSIDE the
  * batch (CdcRead unions one diff per commit), so batch boundaries never
  * change the emitted rows, only their grouping.
  *
  * This is a V1 `Source`, not a DSv2 `MicroBatchStream`, deliberately:
  * the CDC feed is a per-commit join of two snapshot reads — a whole
  * QUERY per batch — which `getBatch`'s return-a-DataFrame contract
  * expresses directly, while a DSv2 stream would have to force the joins
  * through single-partition readers. The same structural reason upstream
  * Hudi and Delta serve their streaming through V1 sources.
  *
  * Honored stream options: `stream.start.timestamp` (fresh streams begin
  * AFTER this commit; checkpoints win on restart) and the
  * [[CommitAdmission]] caps `stream.commits.per.batch` /
  * `stream.max.bytes.per.batch` (each batch advances at most N commit
  * timestamps / ~B bytes of touched slices — in-session pacing once the
  * first batch anchors the position; the first batch after a restart and
  * a Trigger.AvailableNow drain span the full backlog, since V1 offers
  * no start-aware latestOffset, and the unanchored tip is exactly what
  * keeps the AvailableNow pinned target lossless). All CdcRead refusals
  * (cleaned
  * before-images, archived predecessors, meta-field-less tables) fire at
  * batch planning, failing the query loudly rather than feeding it wrong
  * images.
  */
class GraftCdcSource(
    spark: SparkSession,
    basePath: String,
    options: Map[String, String]
) extends Source {

  private case class CommitOffset(ts: String) extends Offset {
    override def json(): String = ts
  }

  /** Read options forwarded to the per-commit snapshot reads — the
    * streaming/format selectors themselves must NOT ride along (the DSv2
    * batch relation would refuse `incremental.format=cdc` all over
    * again), but keygen/ordering options the writers don't persist must.
    */
  private val readOptions: Map[String, String] =
    GraftCdcSource.stripSelectors(options)

  private def freshTable: HudiTable =
    if (readOptions.isEmpty) HudiTable(spark, basePath)
    else HudiTable(spark, basePath, readOptions)

  private val tz = freshTable.config.timelineTimezone

  private val startTs: Option[String] =
    options.get("stream.start.timestamp").map(Timestamps.normalize(_, tz))

  private val commitsPerBatch: Option[Int] =
    options.get("stream.commits.per.batch").map(_.toInt).filter(_ > 0)

  private val maxBytesPerBatch: Option[Long] =
    options.get("stream.max.bytes.per.batch").map(_.toLong).filter(_ > 0)

  override val schema: StructType = CdcRead.cdcSchema(freshTable)

  /** Latest end this source has handed to `getBatch` — the admission
    * anchor for `stream.commits.per.batch`. In-session only: after a
    * restart the anchor is empty and the first batch spans to the tip
    * (getBatch then re-anchors); a stale anchor can only under-admit,
    * never skip commits, because batches always run (anchor, target].
    */
  @volatile private var lastPlanned: Option[String] = None

  override def getOffset: Option[Offset] = {
    val t = freshTable
    t.timeline.latestCommitTimestamp.map { tipTs =>
      val from = lastPlanned.orElse(startTs)
      // unanchored (fresh / post-restart) offers the TIP: under
      // Trigger.AvailableNow the wrapper pins this first offer as the
      // drain target, so a bounded first offer would strand commits
      val bounded =
        if (from.isEmpty) tipTs
        else CommitAdmission.boundedEnd(t, from, tipTs, commitsPerBatch, maxBytesPerBatch)
      CommitOffset(bounded)
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val s = start.map(_.json()).orElse(startTs)
    val e = end.json()
    lastPlanned = Some(e)
    // an equal-or-inverted range (offset replay on restart) plans an
    // empty commit list inside changes() and yields an empty batch
    val batch = CdcRead.changes(spark, basePath, s, Some(e), readOptions)
    GraftSqlShim.asStreamingBatch(spark, batch)
  }

  override def stop(): Unit = ()
}

object GraftCdcSource {

  /** Option keys that select streaming/CDC behavior rather than read
    * semantics — stripped before forwarding to the snapshot reads.
    */
  private val SelectorKeys = Set(
    "incremental.format", "hoodie.datasource.query.incremental.format",
    "query.type", "hoodie.datasource.query.type", "hoodie.read.query.type",
    "stream.start.timestamp", "stream.commits.per.batch",
    "stream.max.bytes.per.batch", "stream.emit.deletes", "path")

  def stripSelectors(options: Map[String, String]): Map[String, String] =
    options.filterNot { case (k, _) =>
      SelectorKeys.contains(k.toLowerCase(java.util.Locale.ROOT))
    }

  /** Whether the (case-insensitive) options request the CDC incremental
    * format — either upstream Spark-Hudi's spelling or the short one.
    */
  def cdcRequested(options: Map[String, String]): Boolean =
    options.exists { case (k, v) =>
      val kl = k.toLowerCase(java.util.Locale.ROOT)
      (kl == "incremental.format" || kl == "hoodie.datasource.query.incremental.format") &&
        v.equalsIgnoreCase("cdc")
    }
}
