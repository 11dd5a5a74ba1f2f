package graft.sources

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}

/** DSv2 scan observability: named metrics surfaced in the Spark UI's SQL
  * tab next to the scan node. The reference exposes its read telemetry as
  * tracing spans (crates/core instruments planning and file-group reads);
  * the Spark-native analog is `CustomMetric`s — driver-side planning
  * counts via `Scan.reportDriverMetrics` and executor-side read counters
  * via `PartitionReader.currentMetricsValues`, both aggregated by Spark's
  * metrics pipeline (no custom listener, no extra RPC).
  *
  * At 100 TB these are the numbers an operator actually debugs with: how
  * many slices the planner admitted (and how many DPP dropped pre-launch),
  * how much log data the MOR merge buffered, and whether delete blocks are
  * doing work. A scan that looks slow with `logBytesDecoded ≈ 0` is
  * parquet-bound; one with a high buffer count is compaction-starved.
  */
object ScanMetrics {
  // driver-side (planning)
  val SlicesPlanned = "slicesPlanned"
  val SlicesRuntimeFiltered = "slicesRuntimeFiltered"
  // executor-side (read)
  val SlicesRead = "slicesRead"
  val BaseFilesRead = "baseFilesRead"
  val LogFilesRead = "logFilesRead"
  val LogBytesDecoded = "logBytesDecoded"
  val LogRecordsBuffered = "logRecordsBuffered"
  val DeleteRecordsSeen = "deleteRecordsSeen"

  /** Every name a task or driver metric can report must appear here —
    * Spark drops updates whose name the scan didn't declare. Each entry is
    * a NAMED class with a no-arg constructor: the SQL status listener
    * re-instantiates the metric by class name to aggregate task values,
    * and an anonymous/captured class renders every value as "N/A".
    */
  def supported: Array[CustomMetric] = Array(
    new SlicesPlannedMetric, new SlicesRuntimeFilteredMetric,
    new SlicesReadMetric, new BaseFilesReadMetric, new LogFilesReadMetric,
    new LogBytesDecodedMetric, new LogRecordsBufferedMetric,
    new DeleteRecordsSeenMetric)
}

final class SlicesPlannedMetric extends CustomSumMetric {
  override def name(): String = ScanMetrics.SlicesPlanned
  override def description(): String = "file slices planned"
}
final class SlicesRuntimeFilteredMetric extends CustomSumMetric {
  override def name(): String = ScanMetrics.SlicesRuntimeFiltered
  override def description(): String = "file slices after runtime filtering"
}
final class SlicesReadMetric extends CustomSumMetric {
  override def name(): String = ScanMetrics.SlicesRead
  override def description(): String = "file slices read"
}
final class BaseFilesReadMetric extends CustomSumMetric {
  override def name(): String = ScanMetrics.BaseFilesRead
  override def description(): String = "base files read"
}
final class LogFilesReadMetric extends CustomSumMetric {
  override def name(): String = ScanMetrics.LogFilesRead
  override def description(): String = "log files read"
}
final class LogBytesDecodedMetric extends CustomSumMetric {
  override def name(): String = ScanMetrics.LogBytesDecoded
  override def description(): String = "log bytes decoded"
}
final class LogRecordsBufferedMetric extends CustomSumMetric {
  override def name(): String = ScanMetrics.LogRecordsBuffered
  override def description(): String = "log records buffered for merge"
}
final class DeleteRecordsSeenMetric extends CustomSumMetric {
  override def name(): String = ScanMetrics.DeleteRecordsSeen
  override def description(): String = "delete records seen"
}

final case class GraftTaskMetric(metricName: String, metricValue: Long)
    extends CustomTaskMetric {
  override def name(): String = metricName
  override def value(): Long = metricValue
}

/** Mutable per-InputPartition read counters, created on the executor by
  * the reader factory and shared by the chunk's per-slice readers; the
  * chain reader snapshots them whenever Spark polls metrics.
  */
final class ReaderCounters {
  var slicesRead = 0L
  var baseFilesRead = 0L
  var logFilesRead = 0L
  var logBytesDecoded = 0L
  var logRecordsBuffered = 0L
  var deleteRecordsSeen = 0L

  def snapshot: Array[CustomTaskMetric] = Array(
    GraftTaskMetric(ScanMetrics.SlicesRead, slicesRead),
    GraftTaskMetric(ScanMetrics.BaseFilesRead, baseFilesRead),
    GraftTaskMetric(ScanMetrics.LogFilesRead, logFilesRead),
    GraftTaskMetric(ScanMetrics.LogBytesDecoded, logBytesDecoded),
    GraftTaskMetric(ScanMetrics.LogRecordsBuffered, logRecordsBuffered),
    GraftTaskMetric(ScanMetrics.DeleteRecordsSeen, deleteRecordsSeen))
}
