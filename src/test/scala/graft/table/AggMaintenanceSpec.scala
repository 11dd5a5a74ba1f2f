package graft.table

import graft.SparkTestBase
import graft.fixtures.HudiFixtureBuilder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The IVM contract: the maintained aggregate equals the aggregate
  * recomputed from the range-end snapshot, bit for bit.
  */
class AggMaintenanceSpec extends SparkTestBase {

  private lazy val table = {
    HudiFixtureBuilder.ensure(spark, sfDir)
    HudiTable(spark, HudiFixtureBuilder.morPath(sfDir))
  }

  test("maintained (T1, T2] aggregate equals the recomputed T2 aggregate") {
    val maintained = AggMaintenance.maintainCountSum(
      table, HudiFixtureBuilder.T1, HudiFixtureBuilder.T2, "o_orderstatus", "o_totalprice")
    val direct = table.snapshot(asOf = Some(HudiFixtureBuilder.T2))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).cast(DoubleType).as("total"))
      .orderBy("o_orderstatus")
    val m = maintained.collect().toSeq
    val r = direct.collect().toSeq
    assert(m == r, s"maintained $m != recomputed $r")
    // the update commit genuinely moved mass: a 'U' group exists and the
    // pre-image groups shrank (retractions really fired)
    assert(m.exists(_.getString(0) == "U"))
  }

  test("CDC-fed maintenance works THROUGH deletes and overwrites: every adjacent range") {
    // the capability the incremental strategies structurally lack: a
    // delete is a before-only CDC row (a retraction an incremental read
    // never surfaces), and an insert-overwrite diffs its replaced groups.
    // Differential over every adjacent commit pair of the MOR fixture
    // (incl. (T2, T3] — the delete commit) and the overwrite fixture
    // (incl. its replacecommit): maintained == recomputed, bit for bit.
    HudiFixtureBuilder.ensure(spark, sfDir)
    val paths = Seq(HudiFixtureBuilder.morPath(sfDir),
      HudiFixtureBuilder.overwritePath(sfDir), HudiFixtureBuilder.clusteredPath(sfDir))
    for (path <- paths) {
      val t = HudiTable(spark, path)
      val ts = t.timeline.completedInstants.map(_.timestamp).distinct.sorted
      for ((p, c) <- ts.zip(ts.tail)) {
        val maintained = AggMaintenance.maintainCountSumCdc(
          t, p, c, "o_orderstatus", "o_totalprice").collect().toSeq
        val direct = t.snapshot(asOf = Some(c))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_totalprice").cast(DecimalType(18, 4))).cast(DoubleType).as("total"))
          .orderBy("o_orderstatus")
          .collect().toSeq
        assert(maintained == direct, s"$path ($p, $c]: $maintained != $direct")
      }
    }
    // and the full (T1, T3] range crosses update AND delete commits
    val t = table
    val full = AggMaintenance.maintainCountSumCdc(
      t, HudiFixtureBuilder.T1, HudiFixtureBuilder.T3, "o_orderstatus", "o_totalprice")
      .collect().toSeq
    val end = t.snapshot(asOf = Some(HudiFixtureBuilder.T3))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).cast(DoubleType).as("total"))
      .orderBy("o_orderstatus")
      .collect().toSeq
    assert(full == end && full.nonEmpty, s"full range: $full != $end")
  }

  test("CDC maintenance chains: T2 state threads into the (T2, T3] step") {
    // the production shape: the maintained state you already HOLD rides
    // in as priorAgg (columns groupCol, n, s) — no start-snapshot scan —
    // and the next range's deltas land on it; chaining two steps equals
    // the one-shot range and the recomputed end state
    val t = table
    import HudiFixtureBuilder.{T1, T2, T3}
    def asPrior(df: org.apache.spark.sql.DataFrame) = df.select(
      col("o_orderstatus"), col("n_rows").as("n"),
      col("total").cast(DecimalType(18, 4)).as("s"))
    val atT2 = AggMaintenance.maintainCountSumCdc(t, T1, T2, "o_orderstatus", "o_totalprice")
    val chained = AggMaintenance.maintainCountSumCdc(
      t, T2, T3, "o_orderstatus", "o_totalprice", priorAgg = Some(asPrior(atT2)))
      .collect().toSeq
    val oneShot = AggMaintenance.maintainCountSumCdc(t, T1, T3, "o_orderstatus", "o_totalprice")
      .collect().toSeq
    assert(chained == oneShot && chained.nonEmpty, s"$chained != $oneShot")
  }

  test("streaming IVM: per-commit CDC micro-batches fold to the end-state aggregate") {
    // the continuous-materialized-view shape at 100 TB: a capped CDC
    // stream delivers per-commit image batches, and foreachBatch applies
    // the retraction algebra to held state — after the AvailableNow drain
    // the state equals the recomputed end snapshot aggregate, exactly
    // (deletes included, which no incremental-read stream could serve)
    HudiFixtureBuilder.ensure(spark, sfDir)
    val p = HudiFixtureBuilder.morPath(sfDir)
    // the fold is TWO-SIDED (additions + retractions aggregated
    // separately): an update that MOVES a row between groups must credit
    // the after-group and debit the before-group — a single per-row
    // (after - before) coalesce would cancel inside the wrong group
    val state = scala.collection.mutable.Map.empty[String, (Long, java.math.BigDecimal)]
    val q2 = spark.readStream.format("hudi-graft")
      .option("incremental.format", "cdc")
      .option("stream.commits.per.batch", "1")
      .load(p)
      .writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val adds = b.filter(col("after").isNotNull)
          .groupBy(col("after.o_orderstatus").as("g"))
          .agg(count(lit(1)).as("dn"),
            sum(col("after.o_totalprice").cast(DecimalType(18, 4))).as("ds"))
          .collect()
        val rets = b.filter(col("before").isNotNull)
          .groupBy(col("before.o_orderstatus").as("g"))
          .agg((count(lit(1)) * -1).as("dn"),
            (sum(col("before.o_totalprice").cast(DecimalType(18, 4))) * -1).as("ds"))
          .collect()
        for (r <- adds ++ rets) {
          val g = r.getString(0)
          val (n0, s0) = state.getOrElse(g, (0L, java.math.BigDecimal.ZERO))
          state(g) = (n0 + r.getLong(1), s0.add(r.getDecimal(2)))
        }
        ()
      }.start()
    try q2.awaitTermination() finally q2.stop()
    val got = state.toSeq.collect { case (g, (n, s)) if n > 0 => (g, n, s.doubleValue) }
      .sortBy(_._1)
    val want = table.snapshot(asOf = Some(HudiFixtureBuilder.T3))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).cast(DoubleType).as("s"))
      .orderBy("o_orderstatus")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want && got.nonEmpty, s"streamed state $got != recomputed $want")
  }

  test("delete blocks behind numDeletes-omitting write stats are detected by the log scan") {
    // the fixture's T3 deltacommit carries delete blocks while its write
    // stats (minimal-stats writer shape) omit numDeletes entirely — the
    // metadata-only guard is blind here, so the guard must recover the
    // proof by scanning the referenced log files
    val e = intercept[IllegalArgumentException] {
      AggMaintenance.maintainCountSum(
        table, HudiFixtureBuilder.T2, HudiFixtureBuilder.T3, "o_orderstatus", "o_totalprice")
    }
    assert(e.getMessage.contains("delete log blocks"))
  }

  test("a destructive replacecommit in the range is rejected (guard fires)") {
    // the reference overwrite fixture: 2 commits then an
    // INSERT_OVERWRITE_TABLE replacecommit that removes keys {1,2,3}
    // with no numDeletes write stats — exactly the drift the numDeletes
    // guard alone cannot see
    val t = Fixtures.table(
      "sample_table/cow/v6_simplekeygen_nonhivestyle_overwritetable.zip",
      "v6_simplekeygen_nonhivestyle_overwritetable",
      "aggmaint_overwrite").map(p => HudiTable(spark, p))
    assume(t.isDefined)
    val instants = t.get.timeline.completedInstants
    val e = intercept[IllegalArgumentException] {
      AggMaintenance.maintainCountSum(
        t.get, instants.head.timestamp, instants.last.timestamp, "isActive", "longField")
    }
    assert(e.getMessage.contains("replacecommit"))
  }

  test("a benign CLUSTER replacecommit in the range passes the guard and maintains exactly") {
    HudiFixtureBuilder.ensure(spark, sfDir)
    val t = HudiTable(spark, HudiFixtureBuilder.clusteredPath(sfDir))
    val maintained = AggMaintenance.maintainCountSum(
      t, HudiFixtureBuilder.T1, HudiFixtureBuilder.T3, "o_orderstatus", "o_totalprice")
    val direct = t.snapshot(asOf = Some(HudiFixtureBuilder.T3))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).cast(DoubleType).as("total"))
      .orderBy("o_orderstatus")
    assert(maintained.collect().toSeq == direct.collect().toSeq)
  }

  test("an insert-only range needs no retractions (first commit)") {
    val maintained = AggMaintenance.maintainCountSum(
      table, "0", HudiFixtureBuilder.T1, "o_orderstatus", "o_totalprice")
    val direct = table.snapshot(asOf = Some(HudiFixtureBuilder.T1))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).cast(DoubleType).as("total"))
      .orderBy("o_orderstatus")
    assert(maintained.collect().toSeq == direct.collect().toSeq)
  }
}
