package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** The one `private[sql]` bridge this engine needs: a V1 streaming
  * `Source.getBatch` must return a DataFrame whose logical plan carries
  * `isStreaming = true` (MicroBatchExecution asserts exactly that), and
  * the only way to stamp an arbitrary already-planned batch query with it
  * is `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)` —
  * which is `private[sql]`. Connectors that ship V1 sources (Delta's
  * DeltaSource being the canonical public example) live in an
  * `org.apache.spark.sql.*` subpackage for the same reason; this object
  * is the entire extent of that access here.
  */
object GraftSqlShim {

  /** Re-plan `batch` (any batch DataFrame — joins, unions, aggregates)
    * as an `isStreaming = true` DataFrame over its physical RDD.
    *
    * LATENCY ACCOUNTING (deliberate, kept after evaluation): under AQE,
    * `toRdd` reaches AdaptiveSparkPlanExec.execute, which submits and
    * awaits the query's SHUFFLE stages right here on the calling
    * (streaming driver) thread — so a CDC batch's join work largely runs
    * during `getBatch` (reported as trigger "planning"/addBatch setup),
    * with only the final stage executing when the sink pulls the RDD.
    * Correctness is unaffected; per-batch wall-clock is unchanged (the
    * work happens exactly once either way); only the ATTRIBUTION inside
    * StreamingQueryProgress shifts (latestOffset/getBatch instead of the
    * sink's addBatch). The lazy alternative — wrapping the logical plan
    * in a deferred LogicalRDD — would hand MicroBatchExecution an
    * unresolved AQE plan whose row-count/metrics assertions fire before
    * materialization; Delta's DeltaSource accepts the same trade for its
    * join-shaped batches. Revisit only if per-phase streaming-lag metrics
    * are ever exported from this source.
    */
  def asStreamingBatch(spark: SparkSession, batch: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ds = batch.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    classic.internalCreateDataFrame(ds.queryExecution.toRdd, batch.schema, isStreaming = true)
  }
}
