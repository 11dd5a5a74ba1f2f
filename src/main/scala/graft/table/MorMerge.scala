package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Merge-on-read record merging as Spark DataFrame ops — the reference's
  * RecordMerger re-expressed declaratively (crates/core/src/merge/
  * record_merger.rs:89-187, ordering.rs:41-51).
  *
  * Strategy OVERWRITE_WITH_LATEST:
  *  1. keep the latest version per (partition, record key): `row_number()`
  *     over desc (orderingField, _hoodie_commit_seqno) — the reference's
  *     `lexsort_to_indices(desc)` + first-seen mask;
  *  2. drop records whose key has a delete with strictly greater ordering:
  *     event-time compare first, commit-time tiebreak, and the
  *     event-time-zero special case (delete with integer-zero ordering
  *     compares on commit time only — ordering.rs:42-49).
  *
  * Null semantics mirror Arrow's row ordering (nulls sort first/lowest):
  * `desc_nulls_last` in the window, and explicit null-safe comparisons in
  * the delete join so a null ordering loses to any non-null.
  *
  * Scale: one hash shuffle keyed by record key (window + the delete
  * aggregation reuse the same partitioning); delete sets are typically tiny
  * so AQE will broadcast the join side when it can.
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
      val w = Window
        .partitionBy(col(PartCol), col(KeyCol))
        .orderBy(desc_nulls_last(ordering), desc_nulls_last(SeqnoCol))
      val latest = data
        .withColumn("__graft_rn", row_number().over(w))
        .filter(col("__graft_rn") === 1)
        .drop("__graft_rn")

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
