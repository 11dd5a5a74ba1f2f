package graft.fs

import graft.core.HoodieConfig

import java.time.{Instant, LocalDate, LocalDateTime, ZoneId}
import java.time.format.DateTimeFormatter

/** Timestamp-based key generator filter transform (R3 — reference:
  * crates/core/src/keygen/timestamp_based.rs): rewrites data-column
  * filters on the keygen source field into filters on the raw
  * `_hoodie_partition_path` string, letting partition pruning apply to
  * tables whose partition path is a FORMATTED timestamp of a data column.
  *
  * Semantics mirrored from the reference (timestamp_based.rs:504-556):
  * Eq/Ne/In/NotIn format the literal(s) directly; Gt/Lt widen to Gte/Lte
  * (partition granularity is coarser than the value) and are emitted only
  * when the output format is lexicographically order-preserving.
  */
final case class TimestampKeyGen(
    sourceField: String,
    timestampType: String, // UNIX_TIMESTAMP | EPOCHMILLISECONDS | EPOCHMICROSECONDS | DATE_STRING | SCALAR | MIXED
    inputFormat: Option[String],
    inputTz: ZoneId,
    scalarUnitMillis: Long,
    outputFormat: String,
    outputTz: ZoneId,
    isHiveStyle: Boolean
) {

  /** `yyyy/MM/dd` hive-style → `Seq(year, month, day)` (timestamp_based.rs:281-302). */
  private val segmentNames: Seq[String] =
    outputFormat.split('/').toSeq.map {
      case "yyyy" => "year"
      case "MM" => "month"
      case "dd" => "day"
      case "HH" => "hour"
      case "mm" => "minute"
      case "ss" => "second"
      case other => other
    }

  /** Parse a filter literal into epoch millis per the configured type. */
  def parseToMillis(value: String): Option[Long] = timestampType.toUpperCase match {
    case "UNIX_TIMESTAMP" => value.toLongOption.map(_ * 1000L)
    case "EPOCHMILLISECONDS" => value.toLongOption
    case "EPOCHMICROSECONDS" => value.toLongOption.map(_ / 1000L)
    case "SCALAR" =>
      value.toLongOption.map(v =>
        if (scalarUnitMillis < 0) v / -scalarUnitMillis else v * scalarUnitMillis)
    case "DATE_STRING" | "MIXED" =>
      // reference order (timestamp_based.rs:365-402): embedded-offset
      // parse first, then naive + input timezone, then date-only
      def viaPattern: Option[Long] = inputFormat.flatMap { fmt =>
        try {
          val f = DateTimeFormatter.ofPattern(fmt)
          def withOffset =
            try Some(java.time.OffsetDateTime.parse(value, f).toInstant.toEpochMilli)
            catch { case _: Exception => None }
          def naive =
            try Some(LocalDateTime.parse(value, f).atZone(inputTz).toInstant.toEpochMilli)
            catch { case _: Exception => None }
          def dateOnly =
            try Some(LocalDate.parse(value, f).atStartOfDay(inputTz).toInstant.toEpochMilli)
            catch { case _: Exception => None }
          withOffset.orElse(naive).orElse(dateOnly)
        } catch { case _: Exception => None }
      }
      // Hudi's Java parser accepts ISO instants (trailing 'Z') that
      // DateTimeFormatter patterns with a 'Z' token reject — fall back
      def viaIso: Option[Long] =
        try Some(java.time.OffsetDateTime.parse(value).toInstant.toEpochMilli)
        catch { case _: Exception => None }
      viaPattern.orElse(viaIso)
    case _ => None
  }

  /** Epoch millis → the full partition path string (hive prefixes per
    * segment when configured) — timestamp_based.rs:425-444.
    */
  def formatPartitionPath(millis: Long): String = {
    val dt = Instant.ofEpochMilli(millis).atZone(outputTz).toLocalDateTime
    val segments = outputFormat.split('/').toSeq.zipWithIndex.map { case (seg, i) =>
      val value = seg
        .replace("yyyy", f"${dt.getYear}%04d")
        .replace("MM", f"${dt.getMonthValue}%02d")
        .replace("dd", f"${dt.getDayOfMonth}%02d")
        .replace("HH", f"${dt.getHour}%02d")
        .replace("mm", f"${dt.getMinute}%02d")
        .replace("ss", f"${dt.getSecond}%02d")
      if (isHiveStyle) s"${segmentNames(i)}=$value" else value
    }
    segments.mkString("/")
  }

  /** Tokens must appear in strictly descending significance for string
    * comparison to respect time order (timestamp_based.rs:469-496).
    */
  def isLexSortableFormat: Boolean = {
    val tokens = Seq("yyyy" -> 6, "MM" -> 5, "dd" -> 4, "HH" -> 3, "mm" -> 2, "ss" -> 1)
    val ranks = scala.collection.mutable.ArrayBuffer.empty[Int]
    var rest = outputFormat
    while (rest.nonEmpty) {
      tokens.find { case (t, _) => rest.startsWith(t) } match {
        case Some((t, r)) => ranks += r; rest = rest.substring(t.length)
        case None => rest = rest.substring(1)
      }
    }
    ranks.nonEmpty && ranks.iterator.sliding(2).withPartial(false).forall(w => w.head > w(1))
  }

  /** Rewrite one filter; non-source-field filters pass through; untrans-
    * formable range filters on a non-sortable format are dropped (pruning
    * is best-effort, the row filter stays authoritative).
    */
  def transformFilter(f: PartitionFilter): Seq[PartitionFilter] = {
    if (f.field != sourceField) return Seq(f)
    val PathField = "_hoodie_partition_path"
    f.op match {
      case "=" =>
        parseToMillis(f.values.head).map(m =>
          PartitionFilter(PathField, f.op, Seq(formatPartitionPath(m)))).toSeq
      case "in" =>
        val paths = f.values.flatMap(parseToMillis).map(formatPartitionPath)
        if (paths.size == f.values.size) Seq(PartitionFilter(PathField, f.op, paths)) else Nil
      // DELIBERATE divergence from the reference (timestamp_based.rs:512-535
      // rewrites Ne/NotIn to partition-path exclusion): the output format is
      // coarser than the value, so excluding partition(X) silently drops
      // every OTHER row of that partition that satisfies ts != X — and
      // pruned files are unrecoverable by the row-level residual. Negations
      // must not prune; the residual filter stays authoritative.
      case "!=" | "not in" => Nil
      case ">" | ">=" | "<" | "<=" =>
        if (!isLexSortableFormat) Nil
        else parseToMillis(f.values.head).map { m =>
          val widened = f.op match {
            case ">" => ">="
            case "<" => "<="
            case other => other
          }
          PartitionFilter(PathField, widened, Seq(formatPartitionPath(m)))
        }.toSeq
      case _ => Nil
    }
  }
}

object TimestampKeyGen {
  private val Prefix = "hoodie.keygen.timebased."
  private val OldPrefix = "hoodie.deltastreamer.keygen.timebased."

  private def key(c: HoodieConfig, suffix: String): Option[String] =
    c.get(Prefix + suffix).orElse(c.get(OldPrefix + suffix))

  def isTimestampKeygen(c: HoodieConfig): Boolean = {
    val cls = c.getOrElse("hoodie.table.keygenerator.class", "")
    val tpe = c.getOrElse("hoodie.table.keygenerator.type", "")
    cls.contains("TimestampBasedKeyGenerator") || tpe.equalsIgnoreCase("TIMESTAMP")
  }

  def fromConfig(c: HoodieConfig): Option[TimestampKeyGen] = {
    if (!isTimestampKeygen(c)) return None
    for {
      source <- c.partitionFields.headOption
      tsType <- key(c, "timestamp.type")
      outFmt <- key(c, "output.dateformat")
    } yield {
      val scalarMillis = key(c, "timestamp.scalar.time.unit")
        .map(_.toUpperCase match {
          case "NANOSECONDS" => -1000000L // divide
          case "MICROSECONDS" => -1000L
          case "MILLISECONDS" => 1L
          case "SECONDS" => 1000L
          case "MINUTES" => 60000L
          case "HOURS" => 3600000L
          case "DAYS" => 86400000L
          case _ => 1000L
        }).getOrElse(1000L) // reference default: SECONDS
      // resolution order per timestamp_based.rs:209-230:
      // input  = timezone → input.timezone → UTC (no-tz naive = UTC)
      // output = timezone → output.timezone → UTC
      val inTz = key(c, "timezone").orElse(key(c, "input.timezone"))
        .filter(_.trim.nonEmpty).map(ZoneId.of).getOrElse(ZoneId.of("UTC"))
      val outTz = key(c, "timezone").orElse(key(c, "output.timezone"))
        .filter(_.trim.nonEmpty).map(ZoneId.of).getOrElse(ZoneId.of("UTC"))
      TimestampKeyGen(
        sourceField = source,
        timestampType = tsType,
        inputFormat = key(c, "input.dateformat"),
        inputTz = inTz,
        scalarUnitMillis = scalarMillis,
        outputFormat = outFmt,
        outputTz = outTz,
        isHiveStyle = c.isHiveStylePartitioning)
    }
  }
}
