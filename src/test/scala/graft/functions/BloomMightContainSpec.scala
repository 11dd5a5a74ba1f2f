package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The bloom prefilter's two contracts: build/probe hash compatibility
  * (stat.bloomFilter's putLong over a long column vs mightContainLong),
  * and zero false NEGATIVES through the codegen'd expression (false
  * positives are fine — the exact join removes them; a false negative
  * silently drops a contaminated document).
  */
class BloomMightContainSpec extends SparkTestBase {

  test("stat.bloomFilter putLong is probe-compatible with mightContainLong") {
    import spark.implicits._
    val values = Seq(1L, 42L, 9999999L, -5L, Long.MinValue, Long.MaxValue)
    val bloom = values.toDF("h").stat.bloomFilter("h", values.size.toLong, 0.01)
    assert(values.forall(bloom.mightContainLong),
      "every inserted hash must probe true (no false negatives)")
  }

  test("graft_bloom_contains never false-negatives and filters most absent grams") {
    import spark.implicits._
    BloomMightContain.register(spark)
    val present = (0 until 1000).map(i => s"gram-$i")
    val bytes = BloomMightContain.buildOverHashes(
      present.toDF("gram"), present.size.toLong, 0.01)
    val probe = (0 until 3000).map(i => s"gram-$i").toDF("gram")
      .where(call_function("graft_bloom_contains", lit(bytes), xxhash64(col("gram"))))
      .collect().map(_.getString(0)).toSet
    assert(present.forall(probe.contains), "all present grams must survive the prefilter")
    // 2000 absent probes at fpp=0.01: allow generous slack, but the
    // filter must actually filter
    assert(probe.size < present.size + 200,
      s"expected ~1% false positives, got ${probe.size - present.size} of 2000")
  }

  test("the probe rejects non-foldable bloom arguments") {
    import spark.implicits._
    BloomMightContain.register(spark)
    // analysis is eager on select — the type check rejects right there
    val e = intercept[Exception] {
      Seq(("a", Array[Byte](1, 2))).toDF("gram", "b")
        .select(call_function("graft_bloom_contains", col("b"), xxhash64(col("gram"))))
        .collect()
    }
    assert(e.getMessage.contains("foldable"))
  }
}
