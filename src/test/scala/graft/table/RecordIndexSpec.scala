package graft.table

import graft.SparkTestBase
import graft.fixtures.HudiFixtureBuilder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The record-index point-lookup path: location correctness against the
  * fixture's known bucketing, both fileId encodings, and the IVM contract
  * that the index-pruned pre-image fetch is bit-identical to the
  * scan-based one.
  */
class RecordIndexSpec extends SparkTestBase {

  private lazy val table = {
    HudiFixtureBuilder.ensure(spark, sfDir)
    HudiTable(spark, HudiFixtureBuilder.morPath(sfDir))
  }

  test("record index is advertised and locates keys in their bucketed file group") {
    assert(RecordIndex.isAvailable(table.config))
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderpriority").limit(50).collect()
    val keys = rows.map(_.getLong(0).toString).toSeq
    val located = RecordIndex.lookup(table.basePath, keys, table.hadoopConf)
    assert(located.size == keys.size)
    // the fixture buckets by o_orderkey % Buckets inside each priority
    // partition — the index must agree with that layout for BOTH fileId
    // encodings (partition 0 raw, others UUID-bits)
    val parts = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderpriority").distinct().collect().map(_.getString(0)).sorted
    for (r <- rows) {
      val k = r.getLong(0)
      val e = located(k.toString)
      assert(e.partitionPath == r.getString(1))
      val partIdx = parts.indexOf(r.getString(1))
      val bucket = (k % HudiFixtureBuilder.Buckets).toInt
      assert(e.fileId == f"00000000-0000-0000-$partIdx%04d-$bucket%012d-0",
        s"key $k located at ${e.fileId}")
    }
    // both encodings actually exercised by the sample
    assert(rows.exists(r => parts.indexOf(r.getString(1)) == 0) &&
      rows.exists(r => parts.indexOf(r.getString(1)) > 0))
  }

  test("absent keys resolve to no entry") {
    val located = RecordIndex.lookup(
      table.basePath, Seq("-1", "999999999999"), table.hadoopConf)
    assert(located.isEmpty)
  }

  test("index-pruned pre-image reads plan only the located file groups") {
    val wanted = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey").limit(2).collect().map(_.getLong(0))
    val located = RecordIndex.lookup(
      table.basePath, wanted.map(_.toString).toSeq, table.hadoopConf)
    assert(located.size == wanted.length)
    val groups = located.values.groupBy(_.partitionPath)
      .view.mapValues(_.map(_.fileId).toSet).toMap
    val pre = table.snapshotForFileGroups(HudiFixtureBuilder.T1, groups)
    // the restricted read returns the keys (plus their bucket-mates) but
    // far fewer rows than the table
    val keys = pre.select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(wanted.forall(keys.contains))
    val total = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(keys.size < total / 2)
  }

  test("indexed maintenance is bit-identical to the scan path and to recompute") {
    val scan = AggMaintenance.maintainCountSum(
      table, HudiFixtureBuilder.T1, HudiFixtureBuilder.T2, "o_orderstatus", "o_totalprice")
    val indexed = AggMaintenance.maintainCountSumIndexed(
      table, HudiFixtureBuilder.T1, HudiFixtureBuilder.T2, "o_orderstatus", "o_totalprice")
    assert(indexed.collect().toSeq == scan.collect().toSeq)
    val direct = table.snapshot(asOf = Some(HudiFixtureBuilder.T2))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).cast(DoubleType).as("total"))
      .orderBy("o_orderstatus")
    assert(indexed.collect().toSeq == direct.collect().toSeq)
  }

  test("a supplied prior aggregate (the stored-state deployment) gives the same result") {
    val prior = table.snapshot(asOf = Some(HudiFixtureBuilder.T1))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).as("s"))
    val indexed = AggMaintenance.maintainCountSumIndexed(
      table, HudiFixtureBuilder.T1, HudiFixtureBuilder.T2, "o_orderstatus", "o_totalprice",
      priorAgg = Some(prior))
    val scan = AggMaintenance.maintainCountSum(
      table, HudiFixtureBuilder.T1, HudiFixtureBuilder.T2, "o_orderstatus", "o_totalprice")
    assert(indexed.collect().toSeq == scan.collect().toSeq)
  }

  test("the key-count gate falls back to the scan path") {
    val viaFallback = AggMaintenance.maintainCountSumIndexed(
      table, HudiFixtureBuilder.T1, HudiFixtureBuilder.T2, "o_orderstatus", "o_totalprice",
      maxIndexedKeys = 1)
    val scan = AggMaintenance.maintainCountSum(
      table, HudiFixtureBuilder.T1, HudiFixtureBuilder.T2, "o_orderstatus", "o_totalprice")
    assert(viaFallback.collect().toSeq == scan.collect().toSeq)
  }
}
