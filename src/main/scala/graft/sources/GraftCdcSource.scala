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
  * timestamps / ~B bytes of touched slices). Admission implements
  * `SupportsAdmissionControl` — the V1-source shape Kafka's source uses —
  * so the engine hands `latestOffset` the true start offset: pacing is
  * restart-correct (the first post-restart batch continues bounded from
  * the checkpoint) and a Trigger.AvailableNow drain marches in bounded
  * batches to its pinned target instead of one backlog-sized batch.
  * All CdcRead refusals (cleaned
  * before-images, archived predecessors, meta-field-less tables) fire at
  * batch planning, failing the query loudly rather than feeding it wrong
  * images.
  */
class GraftCdcSource(
    spark: SparkSession,
    basePath: String,
    options: Map[String, String]
) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit}

  private case class CommitOffset(ts: String) extends Offset {
    override def json(): String = ts
  }

  /** Before-everything sentinel (the DSv2 stream's earliest analog). */
  private val earliest = "00000000000000000"

  /** Read options forwarded to the per-commit snapshot reads — the
    * streaming/format selectors themselves must NOT ride along (the DSv2
    * batch relation would refuse `incremental.format=cdc` all over
    * again), but keygen/ordering options the writers don't persist must.
    */
  private val readOptions: Map[String, String] =
    GraftCdcSource.stripSelectors(options)

  /** The memoized handle every planning step reads from. `freshTable`
    * refreshes it (one timeline-listing revalidation — the POLL a
    * continuous trigger must pay to see new commits); Trigger.AvailableNow
    * drains never refresh after the pin, because every commit ≤ the
    * pinned target was already visible to the pinning handle — a long
    * drain's latestOffset calls plan with ZERO further listings
    * (counter-asserted in GraftCdcStreamSpec).
    */
  @volatile private var memoTable: HudiTable = _

  private def freshTable: HudiTable = {
    val t =
      if (readOptions.isEmpty) HudiTable(spark, basePath)
      else HudiTable(spark, basePath, readOptions)
    memoTable = t
    t
  }

  // one handle for everything resolved at construction (tz, schema)
  private val tableAtStart = freshTable

  private val tz = tableAtStart.config.timelineTimezone

  private val startTs: Option[String] =
    options.get("stream.start.timestamp").map(Timestamps.normalize(_, tz))

  private val commitsPerBatch: Option[Int] =
    options.get("stream.commits.per.batch").map(_.toInt).filter(_ > 0)

  private val maxBytesPerBatch: Option[Long] =
    options.get("stream.max.bytes.per.batch").map(_.toLong).filter(_ > 0)

  override val schema: StructType = CdcRead.cdcSchema(tableAtStart)

  // ---- SupportsAdmissionControl: the engine hands latestOffset the TRUE
  // start (checkpointed or initial), so pacing needs no in-session anchor
  // and survives restarts; the AvailableNow wrapper delegates here per
  // batch, capped at its pinned target — bounded multi-batch drains.

  override def initialOffset(): OffsetV2 =
    CommitOffset(startTs.getOrElse(earliest))

  override def deserializeOffset(json: String): OffsetV2 = CommitOffset(json)

  override def getDefaultReadLimit: ReadLimit =
    CommitAdmission.toReadLimit(commitsPerBatch, maxBytesPerBatch)

  /** Trigger.AvailableNow pins the RAW tip once at query start (the DSv2
    * stream's exact contract) — implemented directly, because the generic
    * AvailableNow wrapper would otherwise pin the first CAPPED offer and
    * strand every commit past it; with the pin here, capped drains march
    * per-batch toward the full target and self-terminate.
    */
  @volatile private var availableNowTarget: Option[String] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget =
      Some(freshTable.timeline.latestCommitTimestamp.getOrElse(earliest))

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    // under an AvailableNow pin the target is immutable and the pinning
    // handle saw every commit ≤ it — reuse it, no relisting; continuous
    // triggers refresh (the poll that observes new commits)
    lazy val t = if (availableNowTarget.isDefined) memoTable else freshTable
    val target = availableNowTarget.getOrElse(
      t.timeline.latestCommitTimestamp.getOrElse(earliest))
    // the engine passes NULL start on a V1 source's first micro-batch
    // (KafkaSource's latestOffset tolerates the same) — fall back to the
    // configured start / the before-everything sentinel
    val s = Option(start).map(_.json()).getOrElse(startTs.getOrElse(earliest))
    // never regress the offset (the DSv2 stream's rule): a start ahead of
    // the tip must not re-admit commits the checkpoint already passed
    if (target <= s) return CommitOffset(s)
    val startOpt = if (s == earliest) None else Some(s)
    // honor the ENGINE-PASSED limit, not the configured caps: under
    // Trigger.Once the engine overrides the default with allAvailable()
    // and expects the whole backlog in one batch
    val (countCap, byteCap) = CommitAdmission.fromReadLimit(limit)
    CommitOffset(CommitAdmission.boundedEnd(t, startOpt, target, countCap, byteCap))
  }

  override def getOffset: Option[Offset] =
    // the engine consults latestOffset(start, limit) on admission-control
    // sources; a call here means a harness bypassed that contract
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) serves offsets for this source")

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val s = start.map(_.json()).orElse(startTs).filterNot(_ == earliest)
    // the memoized handle has seen every commit ≤ `end` by construction:
    // `end` came from a latestOffset over it (or, on restart replay, was
    // committed before this source was constructed)
    val t = memoTable
    // schema pinned at construction vs the live table: a mid-stream
    // evolution would otherwise surface as an opaque MicroBatchExecution
    // output-size assertion — refuse descriptively instead
    val live = CdcRead.cdcSchema(t)
    if (live != schema)
      throw new IllegalStateException(
        "hudi-graft cdc stream: the table schema changed mid-stream — the query was " +
          s"planned over $schema but the table now serves $live; restart the query to " +
          "pick up the new schema")
    // an equal-or-inverted range (offset replay on restart) plans an
    // empty commit list inside changes() and yields an empty batch
    val batch = CdcRead.changes(spark, basePath, s, Some(end.json()), readOptions,
      preOpened = Some(t))
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
