package graft.fs

import graft.core.HoodieConfig
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's TimestampBasedKeyGenerator unit matrix
  * (timestamp_based.rs:594-1075): parse semantics per timestamp type,
  * timezone resolution order, and filter-transform behavior.
  */
class TimestampKeyGenSpec extends AnyFunSuite {

  private def keygen(extra: (String, String)*): TimestampKeyGen = {
    val base = Map(
      "hoodie.table.keygenerator.class" -> "org.apache.hudi.keygen.TimestampBasedKeyGenerator",
      "hoodie.table.partition.fields" -> "ts")
    TimestampKeyGen.fromConfig(HoodieConfig(base ++ extra.toMap)).get
  }

  test("date string with embedded offset parses (embedded-offset-first order)") {
    val kg = keygen(
      "hoodie.keygen.timebased.timestamp.type" -> "DATE_STRING",
      "hoodie.keygen.timebased.input.dateformat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSZ",
      "hoodie.keygen.timebased.output.dateformat" -> "yyyy/MM/dd/HH")
    // trailing 'Z' instant — accepted via the ISO fallback the Java parser has
    val millis = kg.parseToMillis("2023-04-01T12:01:00.123Z").get
    assert(kg.formatPartitionPath(millis) == "2023/04/01/12")
    // explicit numeric offset through the pattern
    val m2 = kg.parseToMillis("2023-04-01T12:01:00.123+0900").get
    assert(kg.formatPartitionPath(m2) == "2023/04/01/03")
  }

  test("naive date string interprets in the input timezone (timestamp_based.rs:651-668)") {
    val kg = keygen(
      "hoodie.keygen.timebased.timestamp.type" -> "DATE_STRING",
      "hoodie.keygen.timebased.input.dateformat" -> "yyyy-MM-dd HH:mm:ss",
      "hoodie.keygen.timebased.input.timezone" -> "Asia/Tokyo",
      "hoodie.keygen.timebased.output.dateformat" -> "yyyy/MM/dd/HH")
    // 2023-04-15 18:30 JST = 09:30 UTC
    val millis = kg.parseToMillis("2023-04-15 18:30:00").get
    assert(kg.formatPartitionPath(millis) == "2023/04/15/09")
  }

  test("unix/epoch/scalar types parse per unit (timestamp_based.rs:678-773)") {
    val unix = keygen(
      "hoodie.keygen.timebased.timestamp.type" -> "UNIX_TIMESTAMP",
      "hoodie.keygen.timebased.output.dateformat" -> "yyyy/MM/dd")
    assert(unix.formatPartitionPath(unix.parseToMillis("1706140800").get) == "2024/01/25")
    val millis = keygen(
      "hoodie.keygen.timebased.timestamp.type" -> "EPOCHMILLISECONDS",
      "hoodie.keygen.timebased.output.dateformat" -> "yyyy/MM/dd")
    assert(millis.formatPartitionPath(millis.parseToMillis("1706140800000").get) == "2024/01/25")
    val micros = keygen(
      "hoodie.keygen.timebased.timestamp.type" -> "EPOCHMICROSECONDS",
      "hoodie.keygen.timebased.output.dateformat" -> "yyyy/MM/dd")
    assert(micros.formatPartitionPath(micros.parseToMillis("1706140800000000").get) == "2024/01/25")
    val days = keygen(
      "hoodie.keygen.timebased.timestamp.type" -> "SCALAR",
      "hoodie.keygen.timebased.timestamp.scalar.time.unit" -> "DAYS",
      "hoodie.keygen.timebased.output.dateformat" -> "yyyy/MM/dd")
    // 19747 days = 2024-01-25
    assert(days.formatPartitionPath(days.parseToMillis("19747").get) == "2024/01/25")
  }

  test("output timezone shifts the partition date (timestamp_based.rs:823-842)") {
    val kg = keygen(
      "hoodie.keygen.timebased.timestamp.type" -> "UNIX_TIMESTAMP",
      "hoodie.keygen.timebased.output.dateformat" -> "yyyy/MM/dd",
      "hoodie.keygen.timebased.output.timezone" -> "America/New_York",
      "hoodie.datasource.write.hive_style_partitioning" -> "true")
    // 2024-01-25 03:00 UTC = 2024-01-24 22:00 EST
    assert(kg.formatPartitionPath(kg.parseToMillis("1706151600").get) ==
      "year=2024/month=01/day=24")
  }

  test("shared timezone key wins over output.timezone and feeds output (timestamp_based.rs:845-877)") {
    val fallback = keygen(
      "hoodie.keygen.timebased.timestamp.type" -> "UNIX_TIMESTAMP",
      "hoodie.keygen.timebased.output.dateformat" -> "yyyy/MM/dd",
      "hoodie.keygen.timebased.timezone" -> "Asia/Tokyo")
    // 2024-01-25 20:00 UTC = 2024-01-26 05:00 JST
    assert(fallback.formatPartitionPath(fallback.parseToMillis("1706212800").get) == "2024/01/26")
    val precedence = keygen(
      "hoodie.keygen.timebased.timestamp.type" -> "UNIX_TIMESTAMP",
      "hoodie.keygen.timebased.output.dateformat" -> "yyyy/MM/dd",
      "hoodie.keygen.timebased.output.timezone" -> "America/New_York",
      "hoodie.keygen.timebased.timezone" -> "Asia/Tokyo")
    assert(precedence.outputTz == java.time.ZoneId.of("Asia/Tokyo"))
  }

  test("range filters widen and require a lex-sortable format (timestamp_based.rs:1016-1075)") {
    val kg = keygen(
      "hoodie.keygen.timebased.timestamp.type" -> "UNIX_TIMESTAMP",
      "hoodie.keygen.timebased.output.dateformat" -> "yyyy/MM/dd")
    val out = kg.transformFilter(PartitionFilter("ts", ">", Seq("1706140800")))
    assert(out == Seq(PartitionFilter("_hoodie_partition_path", ">=", Seq("2024/01/25"))))
    // MM/dd/yyyy is not lexicographically time-ordered: range dropped
    val bad = keygen(
      "hoodie.keygen.timebased.timestamp.type" -> "UNIX_TIMESTAMP",
      "hoodie.keygen.timebased.output.dateformat" -> "MM/dd/yyyy")
    assert(bad.transformFilter(PartitionFilter("ts", ">", Seq("1706140800"))).isEmpty)
    // equality still transforms on any format
    assert(bad.transformFilter(PartitionFilter("ts", "=", Seq("1706140800"))) ==
      Seq(PartitionFilter("_hoodie_partition_path", "=", Seq("01/25/2024"))))
  }

  test("negations never prune (sound divergence from timestamp_based.rs:512-535)") {
    // the output format is coarser than the value: excluding partition(X)
    // would drop other rows of that partition satisfying ts != X, and
    // pruned files are unrecoverable by the row-level residual
    val kg = keygen(
      "hoodie.keygen.timebased.timestamp.type" -> "UNIX_TIMESTAMP",
      "hoodie.keygen.timebased.output.dateformat" -> "yyyy/MM/dd")
    assert(kg.transformFilter(PartitionFilter("ts", "!=", Seq("1706140800"))).isEmpty)
    assert(kg.transformFilter(PartitionFilter("ts", "not in", Seq("1706140800"))).isEmpty)
  }
}
