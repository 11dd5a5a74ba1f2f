package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classify an incremental read's rows as inserts or updates relative to
  * the range-start snapshot — the building block users compose CDC-style
  * downstream sync from when the table has no changelog (the reference
  * treats CDC blocks as plain data, scanner.rs:182, so neither engine has
  * row-level change events; this derives them from two reads).
  *
  * Semantics: a row surfaced by `incremental((start, end])` whose record
  * key existed in the `start` snapshot is an `update`; a fresh key is an
  * `insert`. Deletes are invisible to an incremental read by definition
  * (the merged row is gone) — documented limitation, matching the
  * reference's incremental surface.
  *
  * Scale shape (100 TB): the incremental side is bounded by the commit
  * range (typically small); the snapshot side is projected down to the
  * RECORD KEY columns only before the join (column-pruned scan — the
  * pruning reaches the parquet reader through the DSv2 path), and the
  * join is a plain keyed equi-join Spark sizes itself: with a small
  * incremental side AQE turns the shuffle into a broadcast of the
  * CHANGED keys... the snapshot key relation is never broadcast or
  * collected.
  */
object ChangeClassifier {

  /** `incremental((start, end])` rows plus a `change_type` column
    * (`insert` | `update`). Key columns come from the table config's
    * record-key fields.
    */
  def changes(t: HudiTable, start: String, end: String): DataFrame = {
    val keys = t.config.recordKeyFields
    require(keys.nonEmpty, "change classification requires record key fields")
    require(!t.tableSchema.fieldNames.contains("__existed"),
      "table must not already carry a '__existed' column (the existence marker would clash)")
    val inc = t.incremental(Some(start), Some(end))
    val prev = t.snapshot(asOf = Some(start))
      .select(keys.map(col): _*)
      .withColumn("__existed", lit(1))
    inc.join(prev, keys, "left")
      .withColumn("change_type",
        when(col("__existed").isNull, lit("insert")).otherwise(lit("update")))
      .drop("__existed")
  }
}
