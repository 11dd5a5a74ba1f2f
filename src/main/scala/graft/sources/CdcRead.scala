package graft.sources

import graft.core.Timestamps
import graft.table.HudiTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
  * Images are structs of the DATA columns (meta columns excluded: the
  * inference reconstructs record state, and `_hoodie_file_name` etc. of a
  * before-image would leak physical layout, not data).
  *
  * Scale shape: each commit plans TWO snapshot reads restricted to its
  * touched file groups (`cdc.file.groups` — slice-level, not partition-
  * level, so IO is proportional to changed groups), joined on the record
  * key (small change sets broadcast under AQE), unioned across the
  * bounded commit range. Work ∝ change volume × commits, never table size.
  *
  * Replace commits refuse loudly: an inferred diff over the NEW groups of
  * an insert-overwrite would miss the rows it logically deleted (they
  * lived in the replaced groups), and clustering would surface spurious
  * inserts — rather than emit a wrong feed, the range must not contain
  * replacecommits. (Pure-clustering instants whose metadata SAYS so —
  * operationType cluster — are skipped: they change no logical rows.)
  */
object CdcRead {

  /** Upstream Spark-Hudi CDC column names. */
  private val OpCol = "op"
  private val TsCol = "ts_ms"

  def changes(
      spark: SparkSession,
      basePath: String,
      start: Option[String],
      end: Option[String]): DataFrame = {
    val hudi = HudiTable(spark, basePath)
    val tz = hudi.config.timelineTimezone
    val s = start.map(Timestamps.normalize(_, tz))
    val e = end.map(Timestamps.normalize(_, tz))
      .orElse(hudi.timeline.latestCommitTimestamp)

    val inRange = hudi.timeline.instantsBetween(s, e)
    val replaces = inRange.filter(_.action == "replacecommit")
    val skippable = replaces.filter { i =>
      val op = hudi.timeline.commitMetadata(i).path("operationType").asText("")
      op.equalsIgnoreCase("cluster") || op.equalsIgnoreCase("clustering")
    }.map(_.timestamp).toSet
    if (replaces.exists(r => !skippable.contains(r.timestamp)))
      throw new UnsupportedOperationException(
        s"cdc: the range (${s.getOrElse("earliest")}, ${e.getOrElse("latest")}] contains a " +
          "replacecommit that is not pure clustering (insert-overwrite); an inferred diff " +
          "over its new file groups would miss the rows it logically deleted — narrow the " +
          "range to end before it")

    val dataFields = hudi.tableSchema.fields.filterNot(_.name.startsWith("_hoodie_"))
    val dataCols = dataFields.map(f => col(f.name))
    val imageType = StructType(dataFields.toIndexedSeq)
    val cdcSchema = StructType(Seq(
      StructField(OpCol, StringType, nullable = false),
      StructField(TsCol, StringType, nullable = false),
      StructField("before", imageType, nullable = true),
      StructField("after", imageType, nullable = true)))
    def emptyCdc: DataFrame =
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], cdcSchema)

    // all data-commit timestamps, for predecessor lookup (the FULL
    // timeline, not the range: the first in-range commit's before-image
    // is the state as of the last commit BEFORE the range)
    val allTs = hudi.timeline.completedInstants.map(_.timestamp).distinct.sorted

    // one diff per distinct in-range commit timestamp (multi-writer:
    // same-instant commit+deltacommit merge their touched groups)
    val commits = inRange.filterNot(i => skippable.contains(i.timestamp))
      .groupBy(_.timestamp).toSeq.sortBy(_._1)
    if (commits.isEmpty) return emptyCdc

    val perCommit = commits.map { case (c, instants) =>
      val groups = instants.flatMap(i =>
        hudi.timeline.touchedFileGroups(i).valuesIterator.flatten).distinct.sorted
      if (groups.isEmpty) emptyCdc
      else {
        val prev = allTs.takeWhile(_ < c).lastOption
        def readAsOf(ts: String): DataFrame = spark.read.format("hudi-graft")
          .option("as.of.timestamp", ts)
          .option("cdc.file.groups", groups.mkString(","))
          .load(basePath)
        val after = readAsOf(c)
        val before = prev.map(readAsOf).getOrElse(
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], after.schema))
        val b = before.select(col("_hoodie_record_key").as("__bk"),
          struct(dataCols.toIndexedSeq: _*).as("before"))
        val a = after.select(col("_hoodie_record_key").as("__ak"),
          col("_hoodie_commit_time").as("__ac"),
          struct(dataCols.toIndexedSeq: _*).as("after"))
        val tsMs = Timestamps.timelineToEpochMillis(c, tz).toString
        b.join(a, col("__bk") === col("__ak"), "full_outer")
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
    perCommit.reduce(_ unionByName _)
  }
}
