package graft.core

import java.time.format.DateTimeFormatter
import java.time.{Instant => JInstant, LocalDateTime, OffsetDateTime, ZoneId, ZoneOffset}

/** Timestamp normalization for `as.of` / `start` / `end` read options —
  * the input matrix of crates/core/src/timeline/util.rs and
  * docs/reader-spec.md:311-319:
  *
  *  - Hudi timeline format (highest precedence): `yyyyMMddHHmmss[SSS]`
  *  - Unix epoch seconds / millis / micros / nanos (magnitude-detected)
  *  - RFC 3339 with explicit offset (`Z` or `±HH:MM`); naive datetimes and
  *    date-only strings are rejected
  *
  * Everything normalizes to a 17-digit `yyyyMMddHHmmssSSS` string in the
  * table's timeline timezone, comparable lexicographically with instant
  * timestamps.
  */
object Timestamps {
  private val outFmt = DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")

  private def zone(timelineTimezone: String): ZoneId =
    if (timelineTimezone.equalsIgnoreCase("local")) ZoneId.systemDefault()
    else ZoneOffset.UTC

  /** Normalize any accepted input to `yyyyMMddHHmmssSSS`. */
  def normalize(input: String, timelineTimezone: String = "UTC"): String = {
    val s = input.trim
    require(s.nonEmpty, "empty timestamp")
    if (s.forall(_.isDigit)) {
      s.length match {
        case 14 => s + "000" // already timeline format, second precision
        case 17 => s // timeline format w/ millis (epoch-ms is 13 digits, no clash)
        case _ => fromEpoch(s.toLong, timelineTimezone)
      }
    } else {
      // RFC 3339: offset required, naive rejected
      val odt = OffsetDateTime.parse(s)
      odt.toInstant.atZone(zone(timelineTimezone)).toLocalDateTime.format(outFmt)
    }
  }

  /** Magnitude-based epoch unit detection (seconds through nanos). */
  private def fromEpoch(v: Long, tz: String): String = {
    val instant =
      if (v < 100000000000L) JInstant.ofEpochSecond(v) // < 1e11: seconds
      else if (v < 100000000000000L) JInstant.ofEpochMilli(v) // < 1e14: millis
      else if (v < 100000000000000000L) // < 1e17: micros
        JInstant.ofEpochSecond(v / 1000000L, (v % 1000000L) * 1000L)
      else JInstant.ofEpochSecond(v / 1000000000L, v % 1000000000L)
    instant.atZone(zone(tz)).toLocalDateTime.format(outFmt)
  }

  /** Parse a timeline timestamp (14 or 17 digits) to epoch millis UTC. */
  def timelineToEpochMillis(ts: String, timelineTimezone: String = "UTC"): Long = {
    val base = LocalDateTime.parse(ts.substring(0, 14),
      DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
    val millis = if (ts.length == 17) ts.substring(14).toLong else 0L
    base.atZone(zone(timelineTimezone)).toInstant.toEpochMilli + millis
  }
}
