package graft.sources

import graft.SparkTestBase
import graft.fixtures.HudiFixtureBuilder

/** Storage-partitioned joins (SPJ): with the source-level opt-in
  * `spark.sql.graft.planning.preserveDataGrouping` (Spark's own
  * `spark.sql.sources.v2.bucketing.enabled` is default-true in Spark 4),
  * `GraftScan` reports `KeyGroupedPartitioning` over the table's
  * partition fields and plans one keyed input partition per partition
  * value, so a join of two Hudi reads on the partition key needs NO
  * shuffle on either side. These tests pin (a) the shuffle-free plan
  * shape, (b) result equality with the shuffled plan, and (c) the
  * fail-closed fallbacks.
  */
class SpjSpec extends SparkTestBase {

  /** Set confs for the body and UNSET after — restoring via `set` would
    * materialize a ConfigEntry DEFAULT as an explicit value (RuntimeConfig
    * .getOption surfaces entry defaults), silently changing state for
    * later suites in the shared session. None of these keys is set
    * elsewhere in the test session, so unset restores the true default.
    */
  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private lazy val cowPath: String = {
    HudiFixtureBuilder.ensure(spark, sfDir)
    HudiFixtureBuilder.cowPath(sfDir)
  }

  private def joined() = {
    val a = spark.read.format("hudi-graft").load(cowPath)
      .select("o_orderpriority", "o_orderkey")
      .where(org.apache.spark.sql.functions.col("o_orderkey") % 50 === 0)
    val b = spark.read.format("hudi-graft").load(cowPath)
      .select("o_orderpriority", "o_totalprice")
      .where(org.apache.spark.sql.functions.col("o_totalprice") > 100000)
    a.join(b, Seq("o_orderpriority"))
  }

  test("co-partitioned join plans without a shuffle and matches the shuffled result") {
    var spjCount = -1L
    var spjPlan = ""
    withConfs(
      "spark.sql.graft.planning.preserveDataGrouping" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val j = joined()
      spjPlan = j.queryExecution.executedPlan.toString()
      assert(!spjPlan.contains("Exchange"),
        s"SPJ join must not shuffle either side:\n$spjPlan")
      assert(spjPlan.contains("Join"), s"expected a real join:\n$spjPlan")
      spjCount = j.count()
    }
    // same join with bucketing off: a shuffled plan and the same answer
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val j = joined()
      val plan = j.queryExecution.executedPlan.toString()
      assert(plan.contains("Exchange"),
        s"baseline (bucketing off) should shuffle:\n$plan")
      assert(j.count() == spjCount, "SPJ result must equal the shuffled result")
    }
    assert(spjCount > 0, "the joined fixture slice must be non-empty")
  }

  test("grouped scan output equals the chunked scan on a single read") {
    val base = spark.read.format("hudi-graft").load(cowPath)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    withConfs(
      "spark.sql.graft.planning.preserveDataGrouping" -> "true") {
      val got = spark.read.format("hudi-graft").load(cowPath)
        .groupBy("o_orderpriority").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == base, "per-partition grouping must not change row content")
    }
  }

  test("partition-key aggregation is shuffle-free under the grouping report") {
    withConfs(
      "spark.sql.graft.planning.preserveDataGrouping" -> "true",
      "spark.sql.adaptive.enabled" -> "false") {
      val agg = spark.read.format("hudi-graft").load(cowPath)
        .groupBy("o_orderpriority").count()
      val plan = agg.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"GROUP BY the partition key must ride the reported grouping:\n$plan")
      // and the numbers still match the shuffled baseline
      val got = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val base = spark.read.format("hudi-graft").load(cowPath)
        .groupBy("o_orderpriority").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == base)
    }
  }

  test("SPJ holds under AQE (the production default)") {
    withConfs(
      "spark.sql.graft.planning.preserveDataGrouping" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true") {
      val j = joined()
      j.collect() // finalize the adaptive plan
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"SPJ must survive adaptive re-planning:\n$plan")
    }
  }

  test("partially-clustered distribution: per-key splits join correctly") {
    // the fixture has 3 file groups per o_orderpriority; forcing a tiny
    // split target makes each group emit MULTIPLE key-carrying input
    // splits — the shape partially-clustered distribution needs to keep
    // a hot partition parallel. Correctness must hold in all three
    // modes: merged key grouping (default), partially-clustered, and
    // the shuffled baseline.
    def joinedSplit() = {
      val rd = spark.read.format("hudi-graft")
        .option("spj.split.target.bytes", "1") // every slice its own split
      val a = rd.load(cowPath)
        .select("o_orderpriority", "o_orderkey")
        .where(org.apache.spark.sql.functions.col("o_orderkey") % 50 === 0)
      val b = rd.load(cowPath)
        .select("o_orderpriority", "o_totalprice")
        .where(org.apache.spark.sql.functions.col("o_totalprice") > 100000)
      a.join(b, Seq("o_orderpriority"))
    }
    var expected = -1L
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      expected = joinedSplit().count()
      assert(expected > 0)
    }
    withConfs(
      "spark.sql.graft.planning.preserveDataGrouping" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      // merged key grouping: Spark coalesces same-key splits, no shuffle
      val j = joinedSplit()
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"multi-split groups must still key-group without a shuffle:\n$plan")
      assert(j.count() == expected)
    }
    withConfs(
      "spark.sql.graft.planning.preserveDataGrouping" -> "true",
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val j = joinedSplit()
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"partially-clustered SPJ must not shuffle:\n$plan")
      assert(j.count() == expected,
        "partially-clustered grouping must not change the join result")
    }
  }

  test("fail-closed: a STRING partition field with a sentinel dir reports no grouping") {
    // pre-v4 writers put literal 'default'/'' values under the sentinel
    // dir while v4+ writes literal 'default' bare — for a string field
    // the sentinel reading is ambiguous across the join's two sides, so
    // SPJ must fall back to UnknownPartitioning (shuffle), never group
    val path = HudiFixtureBuilder.strpartPath(sfDir)
    withConfs(
      "spark.sql.graft.planning.preserveDataGrouping" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val a = spark.read.format("hudi-graft").load(path).select("r_name", "r_regionkey")
      val b = spark.read.format("hudi-graft").load(path)
        .selectExpr("r_name", "r_regionkey AS rk2")
      val j = a.join(b, Seq("r_name"))
      val plan = j.queryExecution.executedPlan.toString()
      assert(plan.contains("Exchange"),
        s"ambiguous string sentinel must fail closed to a shuffled join:\n$plan")
      assert(j.count() > 0)
    }
  }

  test("an INTEGER partition field's sentinel dir still groups (unambiguous NULL)") {
    // no integral value renders as the sentinel, so the NULL reading is
    // exact and key grouping stays sound — the fail-closed rule above is
    // string-specific, not a blanket sentinel ban
    val path = HudiFixtureBuilder.nullpartPath(sfDir)
    withConfs(
      "spark.sql.graft.planning.preserveDataGrouping" -> "true",
      "spark.sql.adaptive.enabled" -> "false") {
      val agg = spark.read.format("hudi-graft").load(path)
        .groupBy("n_regionkey").count()
      val plan = agg.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"int-typed sentinel table must keep the shuffle-free grouping:\n$plan")
      // NULL partition counted once, under the NULL key
      val got = agg.collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getInt(0))) -> r.getLong(1)).toMap
      assert(got.contains(None) && got(None) == 2L, s"NULL partition rows: $got")
    }
  }

  test("fail-closed: a projection pruning the partition column reports no grouping") {
    withConfs(
      "spark.sql.graft.planning.preserveDataGrouping" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      // the key expressions must be resolvable against the scan output;
      // with o_orderpriority pruned away the scan honestly reports
      // UnknownPartitioning and the join shuffles
      val a = spark.read.format("hudi-graft").load(cowPath).select("o_orderkey")
      val b = spark.read.format("hudi-graft").load(cowPath).select("o_orderkey", "o_totalprice")
      val j = a.join(b, Seq("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString()
      assert(plan.contains("Exchange"),
        s"non-partition-key joins must keep shuffling:\n$plan")
    }
  }
}
