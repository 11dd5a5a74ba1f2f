package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming building blocks for a continuously-ingesting training-data
  * pipeline, composed over any streaming source (including the
  * `hudi-graft` micro-batch reader). Spark-native first: watermarked
  * `dropDuplicates` and windowed aggregates ARE the engine's managed
  * state; custom `flatMapGroupsWithState` appears only for latest-wins
  * upsert views, which no built-in expresses (stream-side
  * overwrite-with-latest needs per-key ordering state, the streaming
  * analog of the MOR merge in [[graft.table.MorMerge]]).
  */
object StreamOps {

  /** Streaming exact dedup: keep the FIRST record per key, with state
    * bounded by the watermark on `eventTimeCol` — the streaming analog of
    * the batch `dedup_exact` operator. Pure built-ins: Spark manages the
    * seen-keys store, drops state older than the watermark, and scales it
    * per-partition across executors.
    */
  def dedupFirst(
      stream: DataFrame,
      keyCols: Seq[String],
      eventTimeCol: String,
      watermark: String): DataFrame =
    stream
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicates(keyCols :+ eventTimeCol)

  /** Watermarked tumbling-window aggregation — the streaming shape of the
    * hourly-rollup batch query (`q_events_hourly`): append-mode emission
    * once the watermark passes a window, partial aggregation map-side.
    */
  def windowedCounts(
      stream: DataFrame,
      eventTimeCol: String,
      windowLength: String,
      watermark: String,
      groupCols: Seq[String],
      aggs: Seq[Column]): DataFrame =
    stream
      .withWatermark(eventTimeCol, watermark)
      .groupBy(window(col(eventTimeCol), windowLength) +: groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Latest-wins upsert view: for each key keep the row with the highest
    * `orderingCol` seen so far, emitting a row only when the winner
    * CHANGES (update-log semantics). This is per-key ordering state no
    * built-in expresses — `flatMapGroupsWithState` with one compact state
    * row per key, the streaming analog of overwrite-with-latest
    * (record_merger.rs semantics on an unbounded stream).
    */
  def latestByKey(
      stream: DataFrame,
      keyCols: Seq[String],
      orderingCol: String): DataFrame = {
    val schema = stream.schema
    implicit val rowEnc: Encoder[Row] = Encoders.row(schema)
    val orderingIdx = schema.fieldIndex(orderingCol)
    val keyIdxs = keyCols.map(schema.fieldIndex)

    def orderingOf(r: Row): Double = r.get(orderingIdx) match {
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(s"non-numeric ordering value $other")
    }

    stream
      .groupByKey(r => keyIdxs.map(i => String.valueOf(r.get(i))).mkString("\u0000"))(Encoders.STRING)
      .flatMapGroupsWithState[Row, Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Row], state: GroupState[Row]) =>
          val incoming = rows.reduceOption((a, b) => if (orderingOf(b) > orderingOf(a)) b else a)
          incoming match {
            case None => Iterator.empty
            case Some(best) =>
              val prev = state.getOption
              if (prev.forall(p => orderingOf(best) > orderingOf(p))) {
                state.update(best)
                Iterator.single(best)
              } else Iterator.empty
          }
      }
  }
}
