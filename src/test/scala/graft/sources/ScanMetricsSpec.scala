package graft.sources

import graft.SparkTestBase
import graft.table.Fixtures
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** DSv2 custom metrics: the scan declares planning + read counters and
  * the partition readers report them, so a MOR read's log-decode work is
  * visible on the scan node in the SQL tab (and in the status store the
  * UI renders from).
  */
class ScanMetricsSpec extends SparkTestBase {

  private lazy val morV8 =
    Fixtures.table("quickstart_trips_table/mor/avro/v8_trips_8i3u1d.zip", "v8_trips_8i3u1d")

  test("every counter a reader can emit is declared by the scan") {
    val declared = ScanMetrics.supported.map(_.name).toSet
    val emitted = new ReaderCounters().snapshot.map(_.name()).toSet ++
      Set(ScanMetrics.SlicesPlanned, ScanMetrics.SlicesRuntimeFiltered)
    assert(emitted.subsetOf(declared),
      s"undeclared metric names: ${emitted -- declared} — Spark drops their updates")
  }

  test("the dsv2 scan exposes the custom metrics") {
    assume(morV8.isDefined)
    val df = spark.read.format("hudi-graft").load(morV8.get)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }
    assert(scan.exists(_.supportedCustomMetrics().map(_.name).toSet
      .contains(ScanMetrics.LogBytesDecoded)))
  }

  test("a MOR read reports log-decode metrics through the status store") {
    assume(morV8.isDefined)
    val df = spark.read.format("hudi-graft").load(morV8.get)
    assert(df.count() > 0)
    val store = spark.sharedState.statusStore
    // execution-end processing is async on the listener bus — poll
    val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
    var decoded = -1L
    while (decoded <= 0 && System.nanoTime() < deadline) {
      decoded = store.executionsList().flatMap { e =>
        val values = store.executionMetrics(e.executionId)
        e.metrics.filter(_.name.contains("log bytes decoded"))
          .flatMap(m => values.get(m.accumulatorId))
      }.flatMap(v => scala.util.Try(v.replaceAll("[^0-9]", "").toLong).toOption)
        .foldLeft(-1L)(math.max)
      if (decoded <= 0) Thread.sleep(200)
    }
    assert(decoded > 0, "expected a positive 'log bytes decoded' metric value")
  }

  test("streaming source reports lag metrics in the query progress") {
    assume(morV8.isDefined)
    val q = spark.readStream.format("hudi-graft").load(morV8.get)
      .selectExpr("rider")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.count(); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val progresses = q.recentProgress
    assert(progresses.nonEmpty)
    val m = progresses.last.sources.head.metrics
    // the AvailableNow drain consumed every commit: zero behind, and the
    // one batch planned a positive number of slices
    assert(m.get("commitsBehind") == "0", s"metrics: $m")
    assert(m.get("slicesInLastBatch").toInt > 0, s"metrics: $m")
  }
}
