package graft.fs

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Typed stats-pruning literals (R2/C5): dates, timestamps, and decimals
  * must cast to the representations footer/MDT statistics expose —
  * epoch-day Int, epoch-micros Long, java BigDecimal — so range
  * predicates on the most common fact-table columns actually skip files
  * (the reference arrow-casts literals to any column type,
  * expr/filter.rs:345-357, and prunes Date32, file_pruner.rs:288-293).
  */
class FilePrunerSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("d", DateType),
    StructField("ts", TimestampType),
    StructField("ntz", TimestampNTZType),
    StructField("dec", DecimalType(12, 2)),
    StructField("i", IntegerType),
    StructField("s", StringType)))

  test("date literals cast to epoch-day ints (typed and string forms)") {
    val day = java.time.LocalDate.of(2024, 3, 15)
    val typed = StatsRange.literal(schema, "d", "2024-03-15",
      Some(java.sql.Date.valueOf(day)))
    assert(typed.contains(Int.box(day.toEpochDay.toInt)))
    val viaLocal = StatsRange.literal(schema, "d", "2024-03-15", Some(day))
    assert(viaLocal.contains(Int.box(day.toEpochDay.toInt)))
    // string form is unambiguous for dates: parses without a typed value
    val parsed = StatsRange.literal(schema, "d", "2024-03-15")
    assert(parsed.contains(Int.box(day.toEpochDay.toInt)))
    assert(StatsRange.literal(schema, "d", "not-a-date").isEmpty)
  }

  test("timestamp literals use the typed instant; strings fail open") {
    val instant = java.time.Instant.parse("2024-03-15T10:30:00.123456Z")
    val micros = instant.getEpochSecond * 1000000L + instant.getNano / 1000L
    val viaTs = StatsRange.literal(schema, "ts", "ignored",
      Some(java.sql.Timestamp.from(instant)))
    assert(viaTs.contains(Long.box(micros)))
    val viaInstant = StatsRange.literal(schema, "ts", "ignored", Some(instant))
    assert(viaInstant.contains(Long.box(micros)))
    // wall-time strings are zone-ambiguous (DST fold) -> fail open
    assert(StatsRange.literal(schema, "ts", "2024-03-15 10:30:00").isEmpty)
    // NTZ: LocalDateTime at UTC
    val ldt = java.time.LocalDateTime.of(2024, 3, 15, 10, 30, 0)
    val ntzMicros = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(StatsRange.literal(schema, "ntz", "ignored", Some(ldt))
      .contains(Long.box(ntzMicros)))
  }

  test("decimal literals compare value-based across scales") {
    val lit = StatsRange.literal(schema, "dec", "123.45").get
    // footer stats may carry a different scale; compareTo must still match
    assert(lit.compareTo(new java.math.BigDecimal("123.4500")) == 0)
    val typed = StatsRange.literal(schema, "dec", "ignored",
      Some(new java.math.BigDecimal("99.9"))).get
    assert(typed.compareTo(new java.math.BigDecimal("99.90")) == 0)
    assert(StatsRange.literal(schema, "dec", "abc").isEmpty)
  }

  test("typed ranges drive the shared prune rules") {
    val d0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay.toInt
    val d1 = java.time.LocalDate.of(2024, 6, 30).toEpochDay.toInt
    def c(v: Any) = v.asInstanceOf[Comparable[Any]]
    val v = StatsRange.literal(schema, "d", "2023-12-31").get
    // predicate d <= 2023-12-31 vs extent [2024-01-01, 2024-06-30]: prune
    assert(!StatsRange.allows("<=", v, c(Int.box(d0)), c(Int.box(d1))))
    val in = StatsRange.literal(schema, "d", "2024-02-01").get
    assert(StatsRange.allows("<=", in, c(Int.box(d0)), c(Int.box(d1))))
    // decimal extents
    val dv = StatsRange.literal(schema, "dec", "10.00").get
    assert(!StatsRange.allows(">", dv,
      c(new java.math.BigDecimal("1.00")), c(new java.math.BigDecimal("9.99"))))
    assert(StatsRange.allows(">=", StatsRange.literal(schema, "dec", "9.99").get,
      c(new java.math.BigDecimal("1.00")), c(new java.math.BigDecimal("9.99"))))
  }

  test("cross-type comparisons fail open, never throw") {
    // an Integer literal against (Long, Long) stats: ClassCastException
    // inside allows must surface as "may match"
    val v = StatsRange.literal(schema, "i", "5").get
    def c(x: Any) = x.asInstanceOf[Comparable[Any]]
    assert(StatsRange.allows("=", v, c(Long.box(10L)), c(Long.box(20L))))
  }
}
