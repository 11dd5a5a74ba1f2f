package graft.table

import graft.fs.FileSlice
import graft.log.{InstantRange, LogFileParser, LogFormat, RowAlign}
import graft.util.SerializableConf
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Distributed decode of `.log` delta files into DataFrames.
  *
  * Planning happens on the driver (slice lists are metadata); the byte-level
  * block parsing + Avro decode runs on executors via an RDD over log-file
  * paths — one task per slice, so a 1000-executor cluster decodes 1000 file
  * groups' logs concurrently and no log bytes ever move through the driver.
  */
object LogScan {

  /** A slice's log files, in scan order. */
  private def sliceLogPaths(slice: FileSlice): Seq[String] =
    slice.logFiles.sortBy(_.orderingKey).map(_.path)

  private def parseSlice(
      paths: Seq[String],
      conf: SerializableConf,
      range: InstantRange
  ): Vector[graft.log.LogBlock] = {
    val blocks = paths.flatMap { p =>
      val path = new Path(p)
      val bytes = graft.util.ReadFully(path, conf.value)
      LogFileParser.parse(bytes, range)
    }.toVector
    LogFileParser.applyRollbacks(blocks)
  }

  /** Decode data blocks of all slices' logs → DataFrame with `tableSchema`.
    * Records are aligned to the table schema by field name, with numeric
    * widening for safe Avro→Parquet type skew.
    */
  def dataFrameOfLogRecords(
      spark: SparkSession,
      slices: Seq[FileSlice],
      tableSchema: StructType,
      range: InstantRange,
      conf: SerializableConf,
      partitionValues: FileSlice => Map[String, Any] = _ => Map.empty
  ): DataFrame = {
    val withLogs = slices.filter(_.hasLogFiles)
      .map(sl => (sliceLogPaths(sl), partitionValues(sl)))
    if (withLogs.isEmpty) return emptyDf(spark, tableSchema)
    val parallelism = math.min(withLogs.size, spark.sparkContext.defaultParallelism * 2)
    val schemaJson = tableSchema.json
    val rdd = spark.sparkContext
      .parallelize(withLogs, parallelism)
      .flatMap { case (paths, pv) =>
        val target = DataType.fromJson(schemaJson).asInstanceOf[StructType]
        val patch = pv.map { case (k, v) => target.fieldIndex(k) -> v }
        parseSlice(paths, conf, range).iterator
          .flatMap(RowAlign.blockRows(_, target))
          .map(patchRow(_, patch))
      }
    spark.createDataFrame(rdd, tableSchema)
  }

  /** P6 for log records: dropped partition columns are absent from the
    * writer schema too — re-inject the slice's parsed partition values.
    */
  private def patchRow(r: Row, patch: Map[Int, Any]): Row =
    if (patch.isEmpty) r
    else Row.fromSeq(r.toSeq.zipWithIndex.map { case (v, i) => patch.getOrElse(i, v) })

  /** Single-pass decode of data AND delete blocks — MOR snapshots need
    * both, and separate passes would read + parse every log file twice
    * (at 100 TB that doubles log I/O). One RDD emits table-schema rows
    * tagged by a discriminator column; the cached combined relation is
    * split by filter. The cache rotates per table (previous generation
    * unpersisted) so repeated reads stay bounded.
    */
  def dataFrameOfLogAndDeletes(
      spark: SparkSession,
      cacheKey: String,
      slices: Seq[FileSlice],
      tableSchema: StructType,
      orderingField: String,
      orderingType: DataType,
      range: InstantRange,
      conf: SerializableConf,
      partitionValues: FileSlice => Map[String, Any] = _ => Map.empty
  ): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val flag = "__graft_is_delete"
    val combinedSchema = StructType(tableSchema.fields :+ StructField(flag, BooleanType))
    val deleteSchema = StructType(Seq(
      StructField("_hoodie_commit_time", StringType),
      StructField("_hoodie_record_key", StringType),
      StructField("_hoodie_partition_path", StringType),
      StructField(orderingField, orderingType)))
    val withLogs = slices.filter(_.hasLogFiles)
      .map(sl => (sliceLogPaths(sl), partitionValues(sl)))
    if (withLogs.isEmpty)
      return (emptyDf(spark, tableSchema), emptyDf(spark, deleteSchema))
    val parallelism = math.min(withLogs.size, spark.sparkContext.defaultParallelism * 2)
    val schemaJson = tableSchema.json
    val typeJson = orderingType.json
    val ordField = orderingField
    val rdd = spark.sparkContext
      .parallelize(withLogs, parallelism)
      .flatMap { case (paths, pv) =>
        val target = DataType.fromJson(schemaJson).asInstanceOf[StructType]
        val patch = pv.map { case (k, v) => target.fieldIndex(k) -> v }
        val tpe = DataType.fromJson(typeJson)
        val commitIdx = target.fieldIndex("_hoodie_commit_time")
        val keyIdx = target.fieldIndex("_hoodie_record_key")
        val partIdx = target.fieldIndex("_hoodie_partition_path")
        val ordIdx = target.fieldIndex(ordField)
        parseSlice(paths, conf, range).iterator.flatMap { b =>
          if (b.blockType == LogFormat.DeleteBlock) {
            b.deleteRecords.iterator.map { case (key, part, ord) =>
              val vals = new Array[Any](target.length + 1)
              vals(commitIdx) = b.instantTime
              vals(keyIdx) = key
              vals(partIdx) = part
              vals(ordIdx) = coerce(ord, tpe)
              vals(target.length) = true
              Row.fromSeq(vals.toIndexedSeq)
            }
          } else {
            RowAlign.blockRows(b, target)
              .map(r => Row.fromSeq(patchRow(r, patch).toSeq :+ false))
          }
        }
      }
    val combined = spark.createDataFrame(rdd, combinedSchema)
    // Persist only when the doubled log I/O a second pass would cost
    // outweighs the cache build: below the threshold the materialization
    // job is slower than just parsing the (small) logs once per branch
    // (measured at sf0.1, where the persist regressed hudi_mor_snapshot
    // ~0.3s); above it the single-parse guarantee is the point.
    if (slices.iterator.flatMap(_.logFiles).map(_.size).sum >= persistMinLogBytes)
      rotateCache(cacheKey, combined)
    (combined.filter(!col(flag)).drop(flag),
      combined.filter(col(flag)).select(
        col("_hoodie_commit_time"), col("_hoodie_record_key"),
        col("_hoodie_partition_path"), col(orderingField)))
  }

  private val persistMinLogBytes = 64L << 20

  private val cacheRegistry =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def rotateCache(key: String, df: DataFrame): Unit = {
    // sweep entries whose owning context has stopped: their persisted
    // blocks are gone with the executors, and keeping the DataFrames
    // would pin the dead SparkSessions (the SessionRegistry lifetime
    // class of leak) — a long-lived JVM reading many tables otherwise
    // accumulates one dead relation per (table, commit-range) forever
    for ((k, v) <- cacheRegistry if v.sparkSession.sparkContext.isStopped)
      cacheRegistry.remove(k)
    cacheRegistry.put(key, df).foreach(_.unpersist(false))
    df.persist()
  }

  def emptyDf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  private def coerce(v: Any, target: DataType): Any = RowAlign.coerce(v, target)
}
