package graft.table

import org.apache.spark.sql.{Column, DataFrame}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Merge-on-read record merging as Spark DataFrame ops — the reference's
  * RecordMerger re-expressed declaratively (crates/core/src/merge/
  * record_merger.rs:89-187, ordering.rs:41-51).
  *
  * Strategy OVERWRITE_WITH_LATEST:
  *  1. keep the latest version per (partition, record key): a combinable
  *     `max_by` on the (orderingField, _hoodie_commit_seqno) struct — the
  *     reference's `lexsort_to_indices(desc)` + first-seen mask, without
  *     the sort;
  *  2. drop records whose key has a delete with strictly greater ordering:
  *     event-time compare first, commit-time tiebreak, and the
  *     event-time-zero special case (delete with integer-zero ordering
  *     compares on commit time only — ordering.rs:42-49).
  *
  * Null semantics mirror Arrow's row ordering (nulls sort first/lowest):
  * null struct fields compare lowest in the max_by pick, and explicit
  * null-safe comparisons in the delete join make a null ordering lose to
  * any non-null.
  *
  * Scale: one hash-aggregate shuffle keyed by record key, pre-reduced
  * map-side to one candidate per key per split; delete sets are typically
  * tiny so AQE will broadcast the join side when it can.
  */
object MorMerge {

  private val PartCol = "_hoodie_partition_path"
  private val KeyCol = "_hoodie_record_key"
  private val SeqnoCol = "_hoodie_commit_seqno"
  private val CommitCol = "_hoodie_commit_time"

  /** Arrow-row-style `a > b` where null is lowest: true iff a non-null and
    * (b null or a > b).
    */
  private def gtNullsLow(a: Column, b: Column): Column =
    a.isNotNull && (b.isNull || a > b)

  def merge(
      data: DataFrame,
      deletes: Option[DataFrame],
      orderingField: Option[String],
      strategy: String
  ): DataFrame = strategy match {
    case "APPEND_ONLY" => data
    case "OVERWRITE_WITH_LATEST" =>
      val ordering = orderingField.getOrElse(
        throw new IllegalArgumentException(
          "OVERWRITE_WITH_LATEST requires ordering (precombine) fields"))
      // latest-per-key as a combinable aggregate, NOT a sort window: the
      // struct ordering key compares (orderingField, seqno) lexicographic
      // with null fields lowest (Spark's interpreted struct ordering),
      // exactly the window's desc_nulls_last pick — but max_by partial-
      // aggregates map-side, so the shuffle carries at most one row per
      // (partition, key) per input split instead of every version, and
      // no per-partition sort runs at all. Seqno uniqueness makes the
      // ordering total, so the pick is deterministic despite ties being
      // unstable in max_by generally.
      val latest = data
        .groupBy(col(PartCol), col(KeyCol))
        .agg(max_by(
          struct(data.columns.map(col): _*),
          struct(col(ordering), col(SeqnoCol))).as("__graft_latest"))
        .select(col("__graft_latest.*"))

      deletes match {
        case None => latest
        case Some(dels) =>
          val ordType = dels.schema(ordering).dataType
          val integral = ordType match {
            case ByteType | ShortType | IntegerType | LongType => true
            case _ => false
          }
          // max event-time ordering and max commit-time ordering per key,
          // accumulated SEPARATELY — deliberately mirroring the reference
          // (ordering.rs:77-97 updates the two maxes independently, so a
          // synthetic pair cross-combining one delete's event time with
          // another's commit time is the semantics of record, not a bug
          // here; is_event_time_zero likewise follows the event-time max)
          val delAgg = dels
            .groupBy(col(PartCol).as("__d_part"), col(KeyCol).as("__d_key"))
            .agg(
              max(col(ordering)).as("__d_event"),
              max(col(CommitCol)).as("__d_commit"))

          val recOrd = col(ordering)
          val recCommit = col(CommitCol)
          val commitGt = gtNullsLow(col("__d_commit"), recCommit)
          val eventZero =
            if (integral) col("__d_event") === lit(0).cast(ordType) else lit(false)
          val deleteWins = when(coalesce(eventZero, lit(false)), commitGt)
            .otherwise(
              gtNullsLow(col("__d_event"), recOrd) ||
                (col("__d_event") <=> recOrd && commitGt))

          latest
            .join(delAgg,
              col(PartCol) === col("__d_part") && col(KeyCol) === col("__d_key"),
              "left")
            .filter(col("__d_key").isNull || !coalesce(deleteWins, lit(false)))
            .drop("__d_part", "__d_key", "__d_event", "__d_commit")
      }
    case other =>
      throw new IllegalArgumentException(s"Unknown record merge strategy: $other")
  }
}
