package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Incremental view maintenance for grouped COUNT/SUM aggregates: roll a
  * maintained aggregate forward through a commit range by applying the
  * incremental batch as deltas — the Materialize/Flink IVM shape over a
  * Hudi incremental read, built from [[ChangeClassifier]]:
  *
  *  - `insert` rows contribute +1 / +value to their group;
  *  - `update` rows contribute +1 / +value to their NEW group and the
  *    key's PRE-IMAGE row (from the range-start snapshot) contributes
  *    -1 / -value to its OLD group — the retraction a changelog consumer
  *    would emit.
  *
  * Inherited limitation (documented on ChangeClassifier): deletes are
  * invisible to an incremental read, so a range containing delete
  * commits cannot be maintained — callers bound the range accordingly
  * (the oracle entry maintains (T1, T2]; T3 holds the deletes).
  *
  * Scale shape (100 TB): the prior aggregate is GROUP-sized state, the
  * incremental batch is commit-range-bounded, and the pre-image fetch is
  * the start snapshot semi-joined to the batch's updated keys — the scan
  * is key-pruned by the join (at production scale a keyed state store or
  * record-index point lookup replaces it; the relational shape is the
  * same). Everything combines map-side; no window, no collect. Sums use
  * the DECIMAL(18,4) exact-aggregation discipline so maintained and
  * recomputed aggregates are bit-identical.
  */
object AggMaintenance {

  /** Maintained per-`groupCol` (count, sum of `valueCol`) at `end`,
    * derived from the aggregate at `start` plus the (start, end] deltas.
    * Output: groupCol, n_rows, total.
    */
  def maintainCountSum(
      t: HudiTable,
      start: String,
      end: String,
      groupCol: String,
      valueCol: String
  ): DataFrame = {
    val keys = t.config.recordKeyFields
    require(keys.nonEmpty, "maintenance requires record key fields")
    val dec = (c: String) => col(c).cast(DecimalType(18, 4))

    val prior = t.snapshot(asOf = Some(start))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum(dec(valueCol)).as("s"))

    val changes = ChangeClassifier.changes(t, start, end)
    val additions = changes
      .select(col(groupCol), lit(1L).as("dn"), dec(valueCol).as("ds"))
    val updatedKeys = changes.filter(col("change_type") === "update")
      .select(keys.map(col): _*)
    val retractions = t.snapshot(asOf = Some(start))
      .join(updatedKeys, keys, "left_semi") // pre-images of updated keys
      .select(col(groupCol), lit(-1L).as("dn"), (dec(valueCol) * -1).as("ds"))

    prior.select(col(groupCol), col("n").as("dn"), col("s").as("ds"))
      .unionByName(additions)
      .unionByName(retractions)
      .groupBy(groupCol)
      .agg(sum(col("dn")).as("n_rows"), sum(col("ds")).cast(DoubleType).as("total"))
      .filter(col("n_rows") > 0) // a group emptied by retraction disappears
      .orderBy(groupCol)
  }
}
