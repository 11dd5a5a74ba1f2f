package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Secondary-index reader against the reference's REAL v8 trips fixture
  * bytes (`secondary_index_rider_idx`, type=7 records keyed
  * `escape(value)$escape(recordKey)`), plus the point-lookup planning it
  * feeds and the key escape/split round-trip.
  */
class SecondaryIndexSpec extends SparkTestBase {

  private lazy val trips =
    Fixtures.table("quickstart_trips_table/mor/avro/v8_trips_8i3u1d.zip", "v8_trips_8i3u1d")

  test("escape/splitKey round-trips ARBITRARY strings (property fuzz)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // bias toward the metacharacters the codec must escape
    val chunk = Gen.oneOf(Gen.oneOf("$", "\\", "$$", "\\\\", "\\$", "$\\"),
      Gen.asciiPrintableStr, Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString))
    val str = Gen.listOf(chunk).map(_.mkString)
    val prop = Prop.forAll(str, str) { (v: String, k: String) =>
      val key = s"${SecondaryIndex.escape(v)}$$${SecondaryIndex.escape(k)}"
      SecondaryIndex.splitKey(key).contains((v, k))
    }
    val res = check(Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("escape/splitKey round-trips separator and backslash") {
    for ((v, k) <- Seq(("plain", "key-1"), ("with$dollar", "k$2"),
        ("back\\slash", "k\\3"), ("both\\$", "$\\"))) {
      val key = s"${SecondaryIndex.escape(v)}$$${SecondaryIndex.escape(k)}"
      assert(SecondaryIndex.splitKey(key).contains((v, k)), s"round-trip failed for ($v, $k)")
    }
    assert(SecondaryIndex.splitKey("no-separator").isEmpty)
  }

  test("parses real index_defs and resolves the rider index by column") {
    assume(trips.isDefined)
    val conf = new org.apache.hadoop.conf.Configuration()
    val defs = SecondaryIndex.indexDefs(trips.get, conf)
    assert(defs.contains("secondary_index_rider_idx"))
    assert(defs("secondary_index_rider_idx").sourceFields == Seq("rider"))
    val t = HudiTable(spark, trips.get)
    assert(SecondaryIndex.indexForColumn(trips.get, t.config, "rider", conf)
      .contains("secondary_index_rider_idx"))
    assert(SecondaryIndex.indexForColumn(trips.get, t.config, "driver", conf).isEmpty)
  }

  test("looks up real rider values to record keys, verified against table rows") {
    assume(trips.isDefined)
    val conf = new org.apache.hadoop.conf.Configuration()
    val t = HudiTable(spark, trips.get)
    val rows = t.snapshot().select("rider", "uuid").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byRider = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val someRiders = byRider.keys.toSeq.sorted.take(3)
    val looked = SecondaryIndex.lookup(
      trips.get, "secondary_index_rider_idx", someRiders, conf)
    for (r <- someRiders)
      assert(looked.getOrElse(r, Set.empty) == byRider(r),
        s"index keys for $r diverge from table rows")
    // a value absent from the table resolves to nothing
    assert(SecondaryIndex.lookup(
      trips.get, "secondary_index_rider_idx", Seq("rider-ZZZ"), conf).isEmpty)
  }

  test("real trips: equality on rider plans only the matching file groups") {
    assume(trips.isDefined)
    val all = spark.read.format("hudi-graft").load(trips.get)
    val riders = all.select("rider").distinct().collect().map(_.getString(0)).sorted
    val rider = riders.head
    val df = spark.read.format("hudi-graft").load(trips.get)
      .filter(col("rider") === rider)
    val plan = df.queryExecution.executedPlan.toString()
    val allSlices = all.queryExecution.executedPlan.toString()
    // the index restricts the plan below the full slice count
    def sliceCount(p: String): Int =
      "(\\d+) slices".r.findFirstMatchIn(p).map(_.group(1).toInt).getOrElse(-1)
    assert(sliceCount(plan) > 0 && sliceCount(plan) < sliceCount(allSlices),
      s"index did not restrict: ${sliceCount(plan)} vs ${sliceCount(allSlices)}")
    // and the result matches an unrestricted filter
    val exp = all.filter(col("rider") === rider)
      .select("uuid").collect().map(_.getString(0)).toSet
    val got = df.select("uuid").collect().map(_.getString(0)).toSet
    assert(got == exp)
  }

  test("sidx fixture: status equality plans one group, result exact") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val path = graft.fixtures.HudiFixtureBuilder.sidxPath(sfDir)
    val df = spark.read.format("hudi-graft").load(path)
      .filter(col("o_orderstatus") === "P")
    assert(df.queryExecution.executedPlan.toString().contains("1 slices"),
      s"expected a single planned slice: ${df.queryExecution.executedPlan.toString()}")
    val exp = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderstatus") === "P")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val got = df.select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(exp))
  }

  test("sidx fixture: IN-list plans exactly the matching groups") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val path = graft.fixtures.HudiFixtureBuilder.sidxPath(sfDir)
    val df = spark.read.format("hudi-graft").load(path)
      .filter(col("o_orderstatus").isin("P", "F"))
    assert(df.queryExecution.executedPlan.toString().contains("2 slices"))
    val exp = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderstatus").isin("P", "F")).count()
    assert(df.count() == exp)
  }

  test("regime differential: over-cap key sets fall back to the full plan, same rows") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val path = graft.fixtures.HudiFixtureBuilder.sidxPath(sfDir)
    def run() = spark.read.format("hudi-graft").load(path)
      .filter(col("o_orderstatus") === "P")
    val indexed = run()
    assert(indexed.queryExecution.executedPlan.toString().contains("1 slices"))
    val rows = indexed.select("o_orderkey").collect().map(_.getLong(0)).sorted
    // force the fallback: a one-key cap makes every real lookup over-cap.
    // (The fallback STILL plans one slice here — the status-split layout
    // means footer min/max pruning recovers the same skip, which is
    // itself worth asserting: the cap never costs correctness, and on
    // this layout not even the plan.)
    System.setProperty("graft.secondary.index.max.keys", "1")
    try {
      val full = run()
      assert(full.select("o_orderkey").collect().map(_.getLong(0)).sorted.sameElements(rows))
    } finally System.clearProperty("graft.secondary.index.max.keys")
  }

  test("secondary-index planning is gated to exactly the canonicalizable types") {
    // Eligible = types SecondaryIndex.renderLiteral canonicalizes
    // exactly (string, integrals always; date/decimal/double/timestamp
    // behind per-index rendering detection — r12 added those two,
    // r14 added float32 via the two-axis witness scheme). Booleans
    // stay on the full (fail-open) plan.
    import org.apache.spark.sql.types._
    for (dt <- Seq(StringType, IntegerType, LongType, ShortType, ByteType, DateType,
        DecimalType(10, 2), DoubleType, TimestampType, FloatType))
      assert(graft.sources.GraftScan.secondaryIndexEligible(dt), s"$dt must be eligible")
    for (dt <- Seq(BooleanType))
      assert(!graft.sources.GraftScan.secondaryIndexEligible(dt), s"$dt must not be eligible")
    // the canonical renderings themselves
    import graft.table.SecondaryIndex
    import graft.table.SecondaryIndex.renderLiteral
    assert(renderLiteral(LongType, "42", Some(Long.box(42L))) == Some("42"))
    assert(renderLiteral(IntegerType, "7", Some(Int.box(7))) == Some("7"))
    // without a DETECTED rendering, doubles/timestamps never render
    assert(renderLiteral(DoubleType, "1.0", Some(Double.box(1.0))).isEmpty)
    assert(renderLiteral(TimestampType, "2024-01-01 00:00:00",
      Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))).isEmpty)
    // with one, they follow the writer's digits exactly
    assert(renderLiteral(DoubleType, "1.0", Some(Double.box(1.0)),
      doubleRendering = Some(SecondaryIndex.JavaDoublePlain)) == Some("1.0"))
    assert(renderLiteral(DoubleType, "8", Some(Double.box(8.0)),
      doubleRendering = Some(SecondaryIndex.JavaDoublePlain)) == Some("8.0"))
    // a ".0"-witness verdict proves only plain-region agreement: an
    // exponent-rendering literal must REFUSE (Python/Rust-debug diverge
    // from Java's "1.0E8" there), while a proven (E-witness) verdict
    // probes it
    assert(renderLiteral(DoubleType, "1e8", Some(Double.box(1e8)),
      doubleRendering = Some(SecondaryIndex.JavaDoublePlain)).isEmpty)
    assert(renderLiteral(DoubleType, "1e8", Some(Double.box(1e8)),
      doubleRendering = Some(SecondaryIndex.JavaDoubleProven)) == Some("1.0E8"))
    // non-finite spellings are family-specific (Python stores "nan"/
    // "inf") and carry no 'E' to trip the exponent refusal — the plain
    // envelope must refuse them; the proven family probes Java's forms
    assert(renderLiteral(DoubleType, "NaN", Some(Double.box(Double.NaN)),
      doubleRendering = Some(SecondaryIndex.JavaDoublePlain)).isEmpty)
    assert(renderLiteral(DoubleType, "Infinity", Some(Double.box(Double.PositiveInfinity)),
      doubleRendering = Some(SecondaryIndex.JavaDoublePlain)).isEmpty)
    assert(renderLiteral(DoubleType, "NaN", Some(Double.box(Double.NaN)),
      doubleRendering = Some(SecondaryIndex.JavaDoubleProven)) == Some("NaN"))
    // IEEE signed zero: both spellings probe whichever one renders
    assert(SecondaryIndex.probeSpellings(DoubleType, "0.0").toSet == Set("0.0", "-0.0"))
    assert(SecondaryIndex.probeSpellings(DoubleType, "-0.0").toSet == Set("0.0", "-0.0"))
    assert(SecondaryIndex.probeSpellings(DoubleType, "8.0") == Seq("8.0"))
    assert(SecondaryIndex.probeSpellings(StringType, "0.0") == Seq("0.0"))
    assert(renderLiteral(TimestampType, "ignored",
      Some(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1704067200L))),
      timestampRendering = Some(SecondaryIndex.EpochMicrosRendering)) ==
      Some("1704067200000000"))
    // date rendering is writer-dependent: WITHOUT a detected rendering a
    // date literal never renders (fail open), WITH one it follows it
    val d = Some(java.sql.Date.valueOf("2024-01-31"): Any)
    assert(renderLiteral(DateType, "2024-01-31", d).isEmpty)
    assert(renderLiteral(DateType, "2024-01-31", d,
      Some(SecondaryIndex.IsoDateRendering)) == Some("2024-01-31"))
    assert(renderLiteral(DateType, "2024-01-31", d,
      Some(SecondaryIndex.EpochDayRendering)) ==
      Some(java.time.LocalDate.parse("2024-01-31").toEpochDay.toString))
    // record-KEY rendering trust excludes dates entirely: no entry
    // sample exists to detect from (keys are hash-sharded; blooms store
    // no keys), so the point/bloom tiers keep the full plan
    for (dt <- Seq(StringType, IntegerType, LongType, ShortType, ByteType))
      assert(graft.sources.GraftScan.keyRenderingTrusted(dt), s"$dt must be trusted")
    for (dt <- Seq(DateType, DoubleType, TimestampType, DecimalType(10, 2)))
      assert(!graft.sources.GraftScan.keyRenderingTrusted(dt), s"$dt must not be trusted")
  }

  test("non-identity (expression) index functions refuse planning") {
    // a Hudi 1.0 expression index stores TRANSFORMED key renderings
    // (lower(col), from_unixtime(col), ...) — a raw-literal probe would
    // miss every entry and plan a wrong EMPTY result, so indexForColumn
    // must refuse anything but identity (absent counts as identity)
    val dir = java.nio.file.Files.createTempDirectory("graft_exp_idx")
    java.nio.file.Files.createDirectories(dir.resolve(".hoodie/.index_defs"))
    java.nio.file.Files.write(dir.resolve(".hoodie/.index_defs/index.json"),
      """{"indexDefinitions":{
        |"secondary_index_lower_idx":{"indexName":"secondary_index_lower_idx",
        |  "indexType":"secondary_index","indexFunction":"lower",
        |  "sourceFields":["name"],"indexOptions":{}},
        |"secondary_index_plain_idx":{"indexName":"secondary_index_plain_idx",
        |  "indexType":"secondary_index","indexFunction":"identity",
        |  "sourceFields":["plain"],"indexOptions":{}},
        |"secondary_index_nofn_idx":{"indexName":"secondary_index_nofn_idx",
        |  "indexType":"secondary_index",
        |  "sourceFields":["nofn"],"indexOptions":{}}}}
        |""".stripMargin.replaceAll("\n", "").getBytes("UTF-8"))
    val cfg = graft.core.HoodieConfig(Map(
      "hoodie.table.name" -> "t", "hoodie.table.version" -> "8",
      "hoodie.table.metadata.partitions" ->
        "secondary_index_lower_idx,secondary_index_plain_idx,secondary_index_nofn_idx"))
    val conf = spark.sessionState.newHadoopConf()
    import graft.table.SecondaryIndex.indexForColumn
    assert(indexForColumn(dir.toString, cfg, "name", conf).isEmpty,
      "a lower() expression index must never plan raw-literal probes")
    assert(indexForColumn(dir.toString, cfg, "plain", conf)
      .contains("secondary_index_plain_idx"))
    assert(indexForColumn(dir.toString, cfg, "nofn", conf)
      .contains("secondary_index_nofn_idx"),
      "an absent indexFunction counts as identity (pre-expression writers)")
  }

  test("decimal-key scale detection and literal rendering") {
    import graft.table.SecondaryIndex._
    import org.apache.spark.sql.types.DecimalType
    // unanimous scale-2 with trailing zeros
    assert(classifyDecimalKeys(Iterator("7.07", "123.40", "0.00")) == Some(2))
    assert(classifyDecimalKeys(Iterator("7", "123")) == Some(0))
    // mixed scales, scientific notation, negative scale, junk → None
    assert(classifyDecimalKeys(Iterator("7.07", "7.1")).isEmpty)
    assert(classifyDecimalKeys(Iterator("1E+2")).isEmpty)
    assert(classifyDecimalKeys(Iterator("abc")).isEmpty)
    assert(classifyDecimalKeys(Iterator.empty).isEmpty)
    // literal rendering: exact rescale to the detected scale; lossy
    // rescale or no detected scale fails open
    val bd = Some(new java.math.BigDecimal("7.1"): Any)
    assert(renderLiteral(DecimalType(10, 2), "7.1", bd, None, Some(2)) == Some("7.10"))
    assert(renderLiteral(DecimalType(10, 2), "7.1", bd, None, None).isEmpty)
    assert(renderLiteral(DecimalType(10, 3), "7.123",
      Some(new java.math.BigDecimal("7.123")), None, Some(2)).isEmpty) // lossy
    // Spark's internal Decimal literal shape renders identically
    assert(renderLiteral(DecimalType(10, 2), "7.1",
      Some(org.apache.spark.sql.types.Decimal("7.1")), None, Some(2)) == Some("7.10"))
  }

  test("decimal-indexed column detects the index's scale and plans through it") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val path = graft.fixtures.HudiFixtureBuilder.sidxPath(sfDir)
    val k = spark.read.parquet(s"$sfDir/orders.parquet")
      .agg(org.apache.spark.sql.functions.min(col("o_orderkey"))).head.getLong(0)
    val dec = new java.math.BigDecimal(f"$k%d.${k % 97}%02d")
    val df = spark.read.format("hudi-graft").load(path)
      .filter(col("o_decprice") === dec)
      .select("o_orderkey", "o_decprice")
    assert(df.queryExecution.executedPlan.toString().contains("1 slices"),
      s"decimal index must plan one group: ${df.queryExecution.executedPlan}")
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == k &&
      rows.head.getDecimal(1).compareTo(dec) == 0)
    // an absent decimal value plans zero slices and returns no rows
    val none = spark.read.format("hudi-graft").load(path)
      .filter(col("o_decprice") === new java.math.BigDecimal("0.01"))
    assert(none.queryExecution.executedPlan.toString().contains("0 slices"))
    assert(none.count() == 0)
  }

  test("double-key classification demands a discriminating witness") {
    import graft.table.SecondaryIndex.{classifyDoubleKeys, isShortestPlainDouble,
      JavaDoublePlain, JavaDoubleProven}
    // overlap-only samples (values every writer family renders alike)
    // must FAIL OPEN even though all roundtrip Java-canonically: the
    // sample cannot rule out a shortest-decimal writer whose "8.0"
    // would be stored as "8"
    assert(classifyDoubleKeys(Iterator("0.5", "1.25", "3.75")).isEmpty)
    // a ".0" witness rules out bare shortest-decimal writers but only
    // proves the PLAIN region (Python str / Rust {:?} also emit "8.0")
    assert(classifyDoubleKeys(Iterator("0.5", "8.0", "1.25")).contains(JavaDoublePlain))
    // an exponent-mantissa witness is Java-exclusive -> family proven
    assert(classifyDoubleKeys(Iterator("1.0E20", "0.5")).contains(JavaDoubleProven))
    // a shortest-decimal key ("8") breaks the roundtrip -> fail open
    assert(classifyDoubleKeys(Iterator("8", "8.0", "0.5")).isEmpty)
    // non-numeric / mixed junk fails open; empty fails open
    assert(classifyDoubleKeys(Iterator("abc", "8.0")).isEmpty)
    assert(classifyDoubleKeys(Iterator.empty).isEmpty)
    // the plain-envelope digit-minimality gate: shortest renderings pass
    for (v <- Seq(8.0d, 80.0d, 0.5d, 100.5d, 0.001d, 1234567.5d))
      assert(isShortestPlainDouble(v, java.lang.Double.toString(v)),
        s"$v must be digit-minimal")
    // a rendering carrying more significant digits than the value's
    // roundtrip needs is rejected (the JDK<19 excess-digit shape —
    // synthetic here, since this JDK renders these values minimally)
    assert(!isShortestPlainDouble(0.5d, "0.50000000000000000000001"))
  }

  test("float32-key classification: two-axis witnesses (value family, then format)") {
    import graft.table.SecondaryIndex._
    // "0.1" is float-canonical but NOT the widened double's digits
    // ("0.10000000149011612") — a VALUE-family witness; "0.0" is the
    // ".0" whole-number witness ruling out bare shortest writers →
    // float precision pinned, plain envelope
    assert(classifyFloatKeys(Iterator("0.1", "0.0", "0.5")).contains(FloatPlain))
    // an uppercase-E sample pins Java's float renderer outright
    assert(classifyFloatKeys(Iterator("1.4E-45", "0.1")).contains(JavaFloatProven))
    // widened-only digits pin the widening; the format question then
    // delegates to the double families (".0" present → plain)
    assert(classifyFloatKeys(Iterator("0.10000000149011612", "8.0"))
      .contains(WidenedFloat(JavaDoublePlain)))
    // (the E-form sample must be the WIDENED rendering's digits —
    // "1.0E20" itself is only producible at float precision and would
    // be an F-witness)
    assert(classifyFloatKeys(Iterator("0.10000000149011612",
      java.lang.Double.toString(1e20f.toDouble)))
      .contains(WidenedFloat(JavaDoubleProven)))
    // agreement-only samples (digits identical in both families) keep
    // the family unknown: ".0" present → agreement tier, absent → open
    assert(classifyFloatKeys(Iterator("0.5", "8.0", "1.25")).contains(FloatAgreementPlain))
    assert(classifyFloatKeys(Iterator("0.5", "1.25")).isEmpty)
    // mixed value-family witnesses = inconsistent index → fail open
    assert(classifyFloatKeys(Iterator("0.1", "0.10000000149011612")).isEmpty)
    // bare shortest ("8"), junk, empty → fail open
    assert(classifyFloatKeys(Iterator("8", "8.0", "0.5")).isEmpty)
    assert(classifyFloatKeys(Iterator("abc", "8.0")).isEmpty)
    assert(classifyFloatKeys(Iterator.empty).isEmpty)

    // rendering envelopes
    import org.apache.spark.sql.types.FloatType
    def render(f: Float, v: FloatRendering) =
      renderLiteral(FloatType, f.toString, Some(Float.box(f)), floatRendering = Some(v))
    // float-precision plain: shortest float digits, even family-
    // discriminating ones
    assert(render(0.1f, FloatPlain) == Some("0.1"))
    assert(render(8f, FloatPlain) == Some("8.0"))
    // exponent forms need the proven verdict
    assert(render(1e20f, FloatPlain).isEmpty)
    assert(render(1e20f, JavaFloatProven) == Some("1.0E20"))
    // widened: Double.toString of the widening, inside the inner envelope
    assert(render(0.1f, WidenedFloat(JavaDoublePlain)) == Some("0.10000000149011612"))
    assert(render(8f, WidenedFloat(JavaDoublePlain)) == Some("8.0"))
    assert(render(1e20f, WidenedFloat(JavaDoublePlain)).isEmpty)
    assert(render(1e20f, WidenedFloat(JavaDoubleProven)) ==
      Some(java.lang.Double.toString(1e20f.toDouble)))
    // agreement tier: only literals whose OWN renderings coincide probe
    assert(render(0.5f, FloatAgreementPlain) == Some("0.5"))
    assert(render(8f, FloatAgreementPlain) == Some("8.0"))
    assert(render(0.1f, FloatAgreementPlain).isEmpty, "families disagree on 0.1f")
    // non-finite never probes outside a proven family
    assert(render(Float.NaN, FloatPlain).isEmpty)
    assert(render(Float.PositiveInfinity, FloatAgreementPlain).isEmpty)
    // signed zero probes both index spellings
    assert(probeSpellings(FloatType, "0.0").toSet == Set("0.0", "-0.0"))
    // no verdict → never renders
    assert(renderLiteral(FloatType, "0.5", Some(Float.box(0.5f))).isEmpty)
  }

  test("float-indexed column detects float-precision rendering and plans through it") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val path = graft.fixtures.HudiFixtureBuilder.sidxPath(sfDir)
    val k = spark.read.parquet(s"$sfDir/orders.parquet")
      .agg(org.apache.spark.sql.functions.min(col("o_orderkey"))).head.getLong(0) + 1
    // the probed value is family-DISCRIMINATING (0.1f): a planner that
    // widened before rendering would probe the wrong digits, plan empty,
    // and lose the row
    val df = spark.read.format("hudi-graft").load(path)
      .filter(col("o_fltrate") === org.apache.spark.sql.functions.lit((k / 10.0d).toFloat))
      .select("o_orderkey", "o_fltrate")
    assert(df.queryExecution.executedPlan.toString().contains("1 slices"),
      s"float index must plan one group: ${df.queryExecution.executedPlan}")
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == k &&
      rows.head.getFloat(1) == (k / 10.0d).toFloat)
    // an absent float plans zero slices
    val none = spark.read.format("hudi-graft").load(path)
      .filter(col("o_fltrate") === org.apache.spark.sql.functions.lit(0.05f))
    assert(none.queryExecution.executedPlan.toString().contains("0 slices"))
    assert(none.count() == 0)
  }

  test("timestamp-key classification demands magnitude-unambiguous micros") {
    import graft.table.SecondaryIndex.{classifyTimestampKeys, EpochMicrosRendering}
    // modern epoch-micros: micros reading is 2024, millis reading is
    // year ~55k, seconds reading year ~54M — unambiguous
    assert(classifyTimestampKeys(Iterator("1704067200000000", "1704067201000000"))
      .contains(EpochMicrosRendering))
    // a modern epoch-MILLIS value is ambiguous as micros (1970-01-20) ->
    // wait, 1.7e12 micros = 1970-01-20, in-window for micros AND millis
    // readings, so it must fail open
    assert(classifyTimestampKeys(Iterator("1704067200000")).isEmpty)
    // early-epoch micros (1970-01-02) reads as a plausible 1972 in
    // millis -> ambiguous, fail open
    assert(classifyTimestampKeys(Iterator("86400000000")).isEmpty)
    // one ambiguous sample poisons the set
    assert(classifyTimestampKeys(Iterator("1704067200000000", "86400000000")).isEmpty)
    // formatted renderings never parse as longs -> fail open
    assert(classifyTimestampKeys(Iterator("2024-01-01T00:00:00Z")).isEmpty)
    assert(classifyTimestampKeys(Iterator.empty).isEmpty)
  }

  test("double-indexed column detects the Java rendering and plans through it") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val path = graft.fixtures.HudiFixtureBuilder.sidxPath(sfDir)
    val k = spark.read.parquet(s"$sfDir/orders.parquet")
      .agg(org.apache.spark.sql.functions.min(col("o_orderkey"))).head.getLong(0)
    val df = spark.read.format("hudi-graft").load(path)
      .filter(col("o_dblrate") === k.toDouble / 2.0)
      .select("o_orderkey", "o_dblrate")
    assert(df.queryExecution.executedPlan.toString().contains("1 slices"),
      s"double index must plan one group: ${df.queryExecution.executedPlan}")
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == k &&
      rows.head.getDouble(1) == k.toDouble / 2.0)
    // an absent double plans zero slices (quarter values never occur)
    val none = spark.read.format("hudi-graft").load(path)
      .filter(col("o_dblrate") === 0.25)
    assert(none.queryExecution.executedPlan.toString().contains("0 slices"))
    assert(none.count() == 0)
  }

  test("timestamp-indexed column detects epoch-micros and plans through it") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val path = graft.fixtures.HudiFixtureBuilder.sidxPath(sfDir)
    val k = spark.read.parquet(s"$sfDir/orders.parquet")
      .agg(org.apache.spark.sql.functions.min(col("o_orderkey"))).head.getLong(0)
    val micros = 1704067200000000L + k * 1000000L
    val ts = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(micros / 1000000L))
    val df = spark.read.format("hudi-graft").load(path)
      .filter(col("o_tsmicros") === ts)
      .select("o_orderkey")
    assert(df.queryExecution.executedPlan.toString().contains("1 slices"),
      s"ts index must plan one group: ${df.queryExecution.executedPlan}")
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == k)
  }

  test("date-key rendering classification: unanimous, disjoint, fail-open") {
    import graft.table.SecondaryIndex._
    assert(classifyDateKeys(Iterator("2024-01-31", "1998-08-02")) == Some(IsoDateRendering))
    assert(classifyDateKeys(Iterator("19753", "10402", "-3")) == Some(EpochDayRendering))
    assert(classifyDateKeys(Iterator.empty).isEmpty)
    assert(classifyDateKeys(Iterator("2024-01-31", "19753")).isEmpty) // mixed
    assert(classifyDateKeys(Iterator("not-a-date")).isEmpty)
    // empty parts (a null-valued row's entry) don't disambiguate — skipped
    assert(classifyDateKeys(Iterator("", "19753")) == Some(EpochDayRendering))
    // sampling is bounded: a conforming prefix classifies even when the
    // tail (never read) would not
    val big = Iterator.fill(16)("19753") ++ Iterator("2024-01-31")
    assert(classifyDateKeys(big) == Some(EpochDayRendering))
  }

  test("long-indexed column plans through the canonical numeric rendering") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val path = graft.fixtures.HudiFixtureBuilder.sidxPath(sfDir)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val k = orders.agg(org.apache.spark.sql.functions.min(col("o_custkey"))).head.getLong(0)
    val expSlices = orders.filter(col("o_custkey") === k)
      .select("o_orderstatus").distinct().count()
    val df = spark.read.format("hudi-graft").load(path).filter(col("o_custkey") === k)
    assert(df.queryExecution.executedPlan.toString().contains(s"$expSlices slices"),
      s"expected $expSlices planned slices: ${df.queryExecution.executedPlan.toString()}")
    val exp = orders.filter(col("o_custkey") === k)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val got = df.select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(exp))
    // regime differential: capped lookups fall back, same rows
    System.setProperty("graft.secondary.index.max.keys", "0")
    try {
      val full = spark.read.format("hudi-graft").load(path).filter(col("o_custkey") === k)
      assert(full.select("o_orderkey").collect().map(_.getLong(0)).sorted.sameElements(exp))
    } finally System.clearProperty("graft.secondary.index.max.keys")
  }

  test("conjunctive indexed predicates intersect their file-group sets") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    import org.apache.spark.sql.functions.countDistinct
    val path = graft.fixtures.HudiFixtureBuilder.sidxPath(sfDir)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    // a customer whose orders span >=2 statuses: the cust-index plan
    // alone keeps >=2 groups, the conjunction with one status keeps 1
    val multi = orders.groupBy("o_custkey")
      .agg(countDistinct(col("o_orderstatus")).as("n"))
      .filter(col("n") >= 2)
      .orderBy("o_custkey")
      .limit(1).collect()
    assume(multi.nonEmpty, "no multi-status customer at this SF")
    val k = multi.head.getLong(0)
    val st = orders.filter(col("o_custkey") === k)
      .select("o_orderstatus").orderBy("o_orderstatus").head.getString(0)
    val both = spark.read.format("hudi-graft").load(path)
      .filter(col("o_custkey") === k && col("o_orderstatus") === st)
    assert(both.queryExecution.executedPlan.toString().contains("1 slices"),
      s"intersection must keep exactly 1 slice: ${both.queryExecution.executedPlan.toString()}")
    val exp = orders.filter(col("o_custkey") === k && col("o_orderstatus") === st)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val got = both.select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(exp))
  }

  test("sidx fixture: unknown value plans zero slices and returns no rows") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val path = graft.fixtures.HudiFixtureBuilder.sidxPath(sfDir)
    val df = spark.read.format("hudi-graft").load(path)
      .filter(col("o_orderstatus") === "ZZZ")
    assert(df.count() == 0)
    assert(df.queryExecution.executedPlan.toString().contains("0 slices"))
  }

  test("date-indexed column detects the index's epoch-day rendering and plans through it") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val path = graft.fixtures.HudiFixtureBuilder.datePath(sfDir)
    val hadoopConf = spark.sessionState.newHadoopConf()
    // the fixture writes EPOCH-DAY keys — detection must say so
    assert(graft.table.SecondaryIndex.detectDateRendering(
      path, "secondary_index_date_idx", hadoopConf) ==
      Some(graft.table.SecondaryIndex.EpochDayRendering))
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("o_date", org.apache.spark.sql.functions.to_date(col("o_orderdate")))
    val dt = orders.agg(org.apache.spark.sql.functions.min(col("o_date"))).head.getDate(0)
    // the index maps the min date's record keys to quartile group 0 only
    val df = spark.read.format("hudi-graft").load(path).filter(col("o_date") === dt)
    assert(df.queryExecution.executedPlan.toString().contains("1 slices"),
      s"date index must plan 1 slice: ${df.queryExecution.executedPlan.toString()}")
    val exp = orders.filter(col("o_date") === dt)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val got = df.select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(exp.nonEmpty && got.sameElements(exp))
    // an ISO probe against these epoch-day keys would have planned EMPTY
    // (silent row loss) — directly: the ISO rendering finds no keys
    val iso = graft.table.SecondaryIndex.lookup(
      path, "secondary_index_date_idx", Seq(dt.toLocalDate.toString), hadoopConf)
    assert(iso.values.flatten.isEmpty)
    val epoch = graft.table.SecondaryIndex.lookup(
      path, "secondary_index_date_idx", Seq(dt.toLocalDate.toEpochDay.toString), hadoopConf)
    assert(epoch.values.flatten.toSeq.sorted == exp.map(_.toString).toSeq.sorted)
    // regime differential: tier off (value cap 0) falls back, same rows
    System.setProperty("graft.secondary.index.max.values", "0")
    try {
      val full = spark.read.format("hudi-graft").load(path).filter(col("o_date") === dt)
      assert(full.select("o_orderkey").collect().map(_.getLong(0)).sorted.sameElements(exp))
    } finally System.clearProperty("graft.secondary.index.max.values")
  }
}
