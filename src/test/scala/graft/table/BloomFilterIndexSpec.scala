package graft.table

import graft.SparkTestBase
import graft.fixtures.HudiFixtureBuilder
import org.apache.spark.sql.functions._

/** The bloom_filters MDT tier: serialization round-trip through the
  * exact hadoop classes Hudi's SIMPLE bloom type wraps, index-key
  * lookup, and plan-shape pruning on the modulo-split fixture where
  * range stats can never prune an equality probe.
  */
class BloomFilterIndexSpec extends SparkTestBase {

  test("bloom round-trip: serialized form decodes and answers membership") {
    val keys = (1 to 500).map(i => s"key-$i")
    val ser = BloomFilterIndex.serializeBloom(keys)
    val bloom = BloomFilterIndex.deserialize(ser).get
    // no false negatives, ever
    assert(keys.forall(BloomFilterIndex.mightContain(bloom, _)))
    // at 4096 bits / 500 keys the fp rate is high-ish but far below 1:
    // at least some absent probes must answer "definitely not"
    val absent = (1 to 500).map(i => s"absent-$i")
    assert(absent.count(!BloomFilterIndex.mightContain(bloom, _)) > 100)
    // malformed bytes fail open as None, never throw
    assert(BloomFilterIndex.deserialize("not base64!".getBytes("UTF-8")).isEmpty)
    assert(BloomFilterIndex.deserialize(
      java.util.Base64.getEncoder.encodeToString(Array[Byte](1, 2, 3))
        .getBytes("UTF-8")).isEmpty)
  }

  test("fixture blooms look up by (partition, file) and locate keys") {
    HudiFixtureBuilder.ensure(spark, sfDir)
    val base = HudiFixtureBuilder.bloomPath(sfDir)
    val t = HudiTable(spark, base)
    assert(BloomFilterIndex.isAvailable(t.config))
    val slices = t.fsView.slicesAsOf(HudiFixtureBuilder.T1)
    assert(slices.size == 4)
    val targets = slices.map(sl => (sl.partitionPath, sl.baseFile.get.fileName))
    val blooms = BloomFilterIndex.lookup(base, targets, t.hadoopConf)
    assert(blooms.size == 4)
    // each group's bloom contains its own keys and rejects at least the
    // probes the plan-shape test relies on (modulo classes are disjoint)
    val keys = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey").limit(40).collect().map(_.getLong(0))
    for (k <- keys) {
      val residue = (k % 4).toInt
      val hits = slices.filter { sl =>
        BloomFilterIndex.mightContain(
          blooms((sl.partitionPath, sl.baseFile.get.fileName)), k.toString)
      }
      // the owning group always answers maybe-present
      assert(hits.exists(_.fileId == f"00000000-0000-0000-0000-$residue%012d-0"),
        s"key $k missing from its own group's bloom")
    }
  }

  test("record-key equality plans only bloom-surviving slices, result exact") {
    HudiFixtureBuilder.ensure(spark, sfDir)
    val base = HudiFixtureBuilder.bloomPath(sfDir)
    val df = spark.read.format("hudi-graft").load(base)
      .filter(col("o_orderkey") === 8)
    val plan = df.queryExecution.executedPlan.toString()
    // range stats could never do this: every group spans the whole key
    // range; only the bloom tier drops the other residue classes
    assert(plan.contains("1 slices"), s"bloom pruning did not engage: $plan")
    val exp = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderkey") === 8).count()
    assert(df.count() == exp)
    // an IN-list across two residue classes keeps exactly those groups
    val in2 = spark.read.format("hudi-graft").load(base)
      .filter(col("o_orderkey").isin(8, 9))
    assert(in2.queryExecution.executedPlan.toString().contains("2 slices"))
    assert(in2.count() == spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderkey").isin(8, 9)).count())
    // unfiltered read still returns everything
    assert(spark.read.format("hudi-graft").load(base).count() ==
      spark.read.parquet(s"$sfDir/orders.parquet").count())
  }
}
