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
        case _ => fromEpoch(s, timelineTimezone)
      }
    } else {
      // RFC 3339: offset required, naive rejected
      val odt = OffsetDateTime.parse(s)
      odt.toInstant.atZone(zone(timelineTimezone)).toLocalDateTime.format(outFmt)
    }
  }

  /** Digit-length-based epoch unit detection, matching the reference
    * (timeline/util.rs:86-98): <=10 digits seconds, <=13 millis, <=16
    * micros, else nanos. An 11-digit input is therefore millis (not
    * seconds, as magnitude-based detection would conclude).
    */
  private def fromEpoch(s: String, tz: String): String = {
    val v = s.toLong
    val instant = s.length match {
      case n if n <= 10 => JInstant.ofEpochSecond(v)
      case n if n <= 13 => JInstant.ofEpochMilli(v)
      case n if n <= 16 => JInstant.ofEpochSecond(v / 1000000L, (v % 1000000L) * 1000L)
      case _ => JInstant.ofEpochSecond(v / 1000000000L, v % 1000000000L)
    }
    instant.atZone(zone(tz)).toLocalDateTime.format(outFmt)
  }

  /** Parse a timeline timestamp (14 or 17 digits) to epoch millis UTC.
    * Metadata-table bootstrap timestamps like `00000000000000000` are not
    * valid datetimes; the reference falls back to reading them as epoch
    * millis (instant.rs:203-217) — mirror that.
    */
  def timelineToEpochMillis(ts: String, timelineTimezone: String = "UTC"): Long =
    try {
      val base = LocalDateTime.parse(ts.substring(0, 14),
        DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
      val millis = if (ts.length == 17) ts.substring(14).toLong else 0L
      base.atZone(zone(timelineTimezone)).toInstant.toEpochMilli + millis
    } catch {
      case _: java.time.format.DateTimeParseException => ts.toLong
    }
}
