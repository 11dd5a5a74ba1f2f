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
    val lookedUp = RecordIndex.lookup(table.basePath, keys, table.hadoopConf)
    assert(lookedUp.asOf == HudiFixtureBuilder.T1)
    val located = lookedUp.entries
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
      table.basePath, Seq("-1", "999999999999"), table.hadoopConf).entries
    assert(located.isEmpty)
  }

  test("index-pruned pre-image reads plan only the located file groups") {
    val wanted = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey").limit(2).collect().map(_.getLong(0))
    val located = RecordIndex.lookup(
      table.basePath, wanted.map(_.toString).toSeq, table.hadoopConf).entries
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

  test("index freshness gate: sound only for an index written in [start, end]") {
    import AggMaintenance.indexFreshnessSound
    assert(indexFreshnessSound("20240101000000000", "20240101000000000", "20240102000000000"))
    assert(indexFreshnessSound("20240102000000000", "20240101000000000", "20240102000000000"))
    // MDT-internal suffix on the end commit still counts as "at end"
    assert(indexFreshnessSound("20240102000000000010", "20240101000000000", "20240102000000000"))
    // behind start: pre-start inserts would be missing from the index
    assert(!indexFreshnessSound("20231231000000000", "20240101000000000", "20240102000000000"))
    // ahead of end: may reflect deletes/relocations the range never sees
    assert(!indexFreshnessSound("20240103000000000", "20240101000000000", "20240102000000000"))
  }

  test("an advertised-but-unreadable index throws on lookup and maintenance falls back") {
    val hconf = spark.sessionState.newHadoopConf()
    val fs = org.apache.hadoop.fs.FileSystem.get(hconf)
    val src = new org.apache.hadoop.fs.Path(table.basePath)
    val dst = new org.apache.hadoop.fs.Path(
      System.getProperty("java.io.tmpdir"), s"graft-ri-broken-${System.nanoTime()}")
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, hconf)
    try {
      // wipe the MDT timeline: the index partition is still advertised and
      // its HFiles still present, but no completed MDT commit exists
      val mdtCommit = new org.apache.hadoop.fs.Path(
        dst, s".hoodie/metadata/.hoodie/${HudiFixtureBuilder.T1}.deltacommit")
      assert(fs.delete(mdtCommit, false))
      val broken = HudiTable(spark, dst.toString)
      intercept[IllegalStateException] {
        RecordIndex.lookup(broken.basePath, Seq("1"), broken.hadoopConf)
      }
      // the maintenance entry point must NOT read the broken index as
      // "no key has a pre-image" — it falls back to the scan plan
      val viaFallback = AggMaintenance.maintainCountSumIndexed(
        broken, HudiFixtureBuilder.T1, HudiFixtureBuilder.T2, "o_orderstatus", "o_totalprice")
      val scan = AggMaintenance.maintainCountSum(
        table, HudiFixtureBuilder.T1, HudiFixtureBuilder.T2, "o_orderstatus", "o_totalprice")
      assert(viaFallback.collect().toSeq == scan.collect().toSeq)
    } finally fs.delete(dst, true)
  }

  test("over-cap batches switch to the distributed lookup regime, bit-identical") {
    // maxIndexedKeys=1 forces the over-cap branch: keys shuffle to
    // executors by index file group instead of collecting on the driver
    val before = RecordIndex.distributedLookups.get()
    val distributed = AggMaintenance.maintainCountSumIndexed(
      table, HudiFixtureBuilder.T1, HudiFixtureBuilder.T2, "o_orderstatus", "o_totalprice",
      maxIndexedKeys = 1)
    val distRows = distributed.collect().toSeq
    assert(RecordIndex.distributedLookups.get() == before + 1,
      "the tiny cap must have routed through the distributed lookup")
    val scan = AggMaintenance.maintainCountSum(
      table, HudiFixtureBuilder.T1, HudiFixtureBuilder.T2, "o_orderstatus", "o_totalprice")
    assert(distRows == scan.collect().toSeq)
    // and the driver-lookup regime (default cap) agrees too
    val driver = AggMaintenance.maintainCountSumIndexed(
      table, HudiFixtureBuilder.T1, HudiFixtureBuilder.T2, "o_orderstatus", "o_totalprice")
    assert(distRows == driver.collect().toSeq)
  }

  test("distributed lookup equals the driver lookup on the fixture") {
    import spark.implicits._
    val keys = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").cast("string")).as[String]
    val (asOf, entries) = RecordIndex.lookupDistributed(
      table.basePath, keys, table.hadoopConf)
    val dist = entries.collect().map(e => e.key -> ((e.partitionPath, e.fileId))).toMap
    val drv = RecordIndex.lookup(table.basePath, keys.collect().toSeq, table.hadoopConf)
    assert(asOf == drv.asOf)
    assert(dist == drv.entries.view.mapValues(e => (e.partitionPath, e.fileId)).toMap)
    assert(dist.nonEmpty)
  }

  // ---- real-bytes validation of the key→file-group hash ----------------

  test("real trips bytes: every live key resolves through its mapped group only") {
    val trips = Fixtures.table(
      "quickstart_trips_table/mor/avro/v8_trips_8i3u1d.zip", "v8_trips_8i3u1d")
    assume(trips.isDefined)
    val conf = new org.apache.hadoop.conf.Configuration()
    val t = HudiTable(spark, trips.get)
    // ground truth: the record keys actually present in the table
    val keys = t.snapshot().select("_hoodie_record_key")
      .collect().map(_.getString(0)).toSeq
    assert(keys.nonEmpty)
    // lookup() probes ONLY each key's hash-mapped group on an aligned
    // slice set — a mapping mismatch with the real writer would MISS keys
    val located = RecordIndex.lookup(trips.get, keys, conf).entries
    assert(located.keySet == keys.toSet,
      s"mapped-group lookup missed keys: ${keys.toSet -- located.keySet}")
    // distributed path agrees entry-for-entry
    import spark.implicits._
    val (_, entries) = RecordIndex.lookupDistributed(trips.get, keys.toDS(), conf)
    val dist = entries.collect().map(e => e.key -> ((e.partitionPath, e.fileId))).toMap
    assert(dist == located.view.mapValues(e => (e.partitionPath, e.fileId)).toMap)
  }
}
