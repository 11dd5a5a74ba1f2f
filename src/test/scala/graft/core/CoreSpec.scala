package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Unit matrix for the driver-side metadata layer: instant filename
  * parsing (reference cases: crates/core/src/timeline/instant.rs:315+),
  * timestamp normalization (docs/reader-spec.md:311-319,
  * timeline/util.rs:86-98), hoodie.properties accessors.
  */
class CoreSpec extends AnyFunSuite {

  // --- HoodieInstant.parse -----------------------------------------------
  test("parse v6 completed commit") {
    val i = HoodieInstant.parse("20240418172802262.commit").get
    assert(i.timestamp == "20240418172802262")
    assert(i.action == "commit" && i.isCompleted)
    assert(i.completionTimestamp.isEmpty)
  }

  test("parse v6 14-digit second-precision timestamp") {
    val i = HoodieInstant.parse("20240418172802.commit").get
    assert(i.timestamp == "20240418172802" && i.isCompleted)
  }

  test("parse v8 completed deltacommit with completion ts") {
    val i = HoodieInstant.parse("20251220210108078_20251220210109593.deltacommit").get
    assert(i.timestamp == "20251220210108078")
    assert(i.completionTimestamp.contains("20251220210109593"))
    assert(i.action == "deltacommit" && i.isCompleted)
  }

  test("parse states: requested / inflight are not completed") {
    val req = HoodieInstant.parse("20240418172802262.commit.requested").get
    assert(req.state == HoodieInstant.Requested && !req.isCompleted)
    val inf = HoodieInstant.parse("20240418172802262.inflight").get
    assert(inf.state == HoodieInstant.Inflight && inf.action == "commit")
    val dcInf = HoodieInstant.parse("20240418172802262.deltacommit.inflight").get
    assert(dcInf.state == HoodieInstant.Inflight && dcInf.action == "deltacommit")
  }

  test("non-loadable actions and junk are rejected") {
    assert(HoodieInstant.parse("20251220210117766_20251220210118628.indexing").isEmpty)
    assert(HoodieInstant.parse("20251220210129235.compaction.requested").isEmpty)
    assert(HoodieInstant.parse("hoodie.properties").isEmpty)
    assert(HoodieInstant.parse("archived").isEmpty)
    assert(HoodieInstant.parse(".commit").isEmpty)
    assert(HoodieInstant.parse("notatimestamp.commit").isEmpty)
  }

  test("replacecommit parses") {
    val i = HoodieInstant.parse("20240418172802262.replacecommit").get
    assert(i.action == "replacecommit" && i.isCompleted)
  }

  test("instant fileName round-trips") {
    val names = Seq(
      "20240418172802262.commit",
      "20251220210108078_20251220210109593.deltacommit",
      "20240418172802262.commit.requested",
      "20240418172802262.deltacommit.inflight")
    for (n <- names) assert(HoodieInstant.parse(n).get.fileName == n)
  }

  // --- Timestamps --------------------------------------------------------
  test("normalize timeline formats") {
    assert(Timestamps.normalize("20240418172802") == "20240418172802000")
    assert(Timestamps.normalize("20240418172802262") == "20240418172802262")
  }

  test("normalize epoch by digit length (reference unit detection)") {
    // 10 digits: seconds
    assert(Timestamps.normalize("1713461282") == "20240418172802000")
    // 11 digits: millis (magnitude-based detection would say seconds)
    assert(Timestamps.normalize("17134612820") == "19700718073652820")
    // 13 digits: millis
    assert(Timestamps.normalize("1713461282262") == "20240418172802262")
    // 16 digits: micros
    assert(Timestamps.normalize("1713461282262123") == "20240418172802262")
    // 19 digits: nanos
    assert(Timestamps.normalize("1713461282262123456") == "20240418172802262")
  }

  test("normalize RFC3339 with offset; naive rejected") {
    assert(Timestamps.normalize("2024-04-18T17:28:02.262Z") == "20240418172802262")
    assert(Timestamps.normalize("2024-04-18T19:28:02.262+02:00") == "20240418172802262")
    intercept[Exception](Timestamps.normalize("2024-04-18T17:28:02"))
    intercept[Exception](Timestamps.normalize("2024-04-18"))
  }

  test("timelineToEpochMillis with epoch-millis fallback") {
    assert(Timestamps.timelineToEpochMillis("20240418172802262") == 1713461282262L)
    assert(Timestamps.timelineToEpochMillis("20240418172802") == 1713461282000L)
    // metadata-table bootstrap instant: not a datetime, read as epoch millis
    assert(Timestamps.timelineToEpochMillis("00000000000000000") == 0L)
  }

  // --- HoodieConfig ------------------------------------------------------
  private val v6Props = Map(
    "hoodie.table.name" -> "t",
    "hoodie.table.version" -> "6",
    "hoodie.table.type" -> "COPY_ON_WRITE",
    "hoodie.table.precombine.field" -> "longField",
    "hoodie.table.partition.fields" -> "byteField",
    "hoodie.table.recordkey.fields" -> "id",
    // stray key that must be ignored pre-v8:
    "hoodie.timeline.path" -> "timeline")

  test("timelinePath ignored for pre-v8, honored for v8+") {
    assert(HoodieConfig(v6Props).timelinePath == "")
    val v8 = HoodieConfig(v6Props + ("hoodie.table.version" -> "8"))
    assert(v8.timelinePath == "timeline")
    val v8default = HoodieConfig(v6Props + ("hoodie.table.version" -> "8") - "hoodie.timeline.path")
    assert(v8default.timelinePath == "timeline")
  }

  test("tableVersion is required") {
    intercept[IllegalArgumentException](HoodieConfig(Map("hoodie.table.name" -> "x")).tableVersion)
  }

  test("ordering fields fall back to deprecated precombine key") {
    assert(HoodieConfig(v6Props).orderingFields == Seq("longField"))
  }

  test("merge strategy defaulting rules") {
    assert(HoodieConfig(v6Props).recordMergeStrategy == "OVERWRITE_WITH_LATEST")
    val noOrdering = HoodieConfig(v6Props - "hoodie.table.precombine.field")
    assert(noOrdering.recordMergeStrategy == "APPEND_ONLY")
    val noMeta = HoodieConfig(v6Props + ("hoodie.populate.meta.fields" -> "false"))
    assert(noMeta.recordMergeStrategy == "APPEND_ONLY")
  }
}
