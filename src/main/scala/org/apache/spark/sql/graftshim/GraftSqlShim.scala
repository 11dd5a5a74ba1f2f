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
    * as an `isStreaming = true` DataFrame over its physical RDD. Planning
    * happens now, driver-side; execution stays lazy until the micro-batch
    * sink runs the wrapped RDD.
    */
  def asStreamingBatch(spark: SparkSession, batch: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ds = batch.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    classic.internalCreateDataFrame(ds.queryExecution.toRdd, batch.schema, isStreaming = true)
  }
}
