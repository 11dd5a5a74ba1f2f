package graft.table

import graft.SparkTestBase
import graft.fixtures.HudiFixtureBuilder
import org.apache.spark.sql.functions._

/** End-to-end reads over the mor_log_only fixture (file group 1 exists
  * only as log files). The snapshot itself is oracle-checked
  * (`hudi_mor_log_only` / `hudi_dsv2_log_only`); these tests pin the query
  * surfaces the oracle doesn't cover — time travel around the group's
  * birth, read-optimized exclusion, and incremental ranges.
  */
class LogOnlyTableSpec extends SparkTestBase {

  import HudiFixtureBuilder.{T1, T2, T3}

  private lazy val table: HudiTable = {
    HudiFixtureBuilder.ensure(spark, sfDir)
    HudiTable(spark, HudiFixtureBuilder.morLogOnlyPath(sfDir))
  }

  private def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("o_orderkey").collect().map(_.getLong(0)).toSet

  private lazy val src = spark.read.parquet(s"$sfDir/orders.parquet")
  private lazy val mod3_0 = keys(src.filter(col("o_orderkey") % 3 === 0))
  private lazy val mod3_1 = keys(src.filter(col("o_orderkey") % 3 === 1))

  test("time travel before the log-only group's creating deltacommit hides it") {
    assert(keys(table.snapshot(asOf = Some(T1))) == mod3_0)
  }

  test("time travel at the creating deltacommit sees unmodified inserts") {
    val df = table.snapshot(asOf = Some(T2))
    assert(keys(df) == mod3_0 ++ mod3_1)
    // T3 updates not visible yet
    assert(df.filter(col("o_orderstatus") === "U").count() == 0)
  }

  test("snapshot applies updates and deletes inside the base-less group") {
    val df = table.snapshot()
    val deleted = mod3_1.filter(k => k % 11 == 0 && k % 5 != 0)
    assert(keys(df) == mod3_0 ++ mod3_1 -- deleted)
    val updated = keys(df.filter(col("o_orderstatus") === "U"))
    assert(updated == mod3_1.filter(_ % 5 == 0) -- deleted)
  }

  test("read-optimized mode reads base file groups only") {
    assert(keys(table.snapshot(readOptimized = true)) == mod3_0)
  }

  test("incremental (T1, T2] returns exactly the log-only inserts") {
    assert(keys(table.incremental(Some(T1), Some(T2))) == mod3_1)
  }

  test("incremental (T2, T3] returns the update survivors of the group") {
    val df = table.incremental(Some(T2), Some(T3))
    val deleted = mod3_1.filter(k => k % 11 == 0 && k % 5 != 0)
    assert(keys(df) == mod3_1.filter(_ % 5 == 0) -- deleted)
    assert(df.filter(col("o_orderstatus") =!= "U").count() == 0)
  }

  test("streaming micro-batches emit the log-only group's rows") {
    HudiFixtureBuilder.ensure(spark, sfDir)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val q = spark.readStream.format("hudi-graft")
      .option("stream.start.timestamp", T1) // begin after the base commit
      .load(HudiFixtureBuilder.morLogOnlyPath(sfDir))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("o_orderkey").collect().foreach(r => seen.add(r.getLong(0)))
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // one batch spanning (T1, T3]: the base-less group's merged state
    val deleted = mod3_1.filter(k => k % 11 == 0 && k % 5 != 0)
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.map(_.longValue).toSet == mod3_1 -- deleted)
  }
}
