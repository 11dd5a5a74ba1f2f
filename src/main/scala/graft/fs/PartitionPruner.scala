package graft.fs

import java.net.URLDecoder
import java.nio.charset.StandardCharsets
import java.time.LocalDate

/** Driver-side partition predicate, mirroring the reference's
  * `PartitionPruner` (crates/core/src/table/partition.rs:96-270): parse a
  * partition path into typed scalars (hive-style `k=v/...`, url-encoded, or
  * positional), evaluate AND-ed filters, and **fail open** on any parse
  * error — pruning is an optimization, the row-level filter stays
  * authoritative.
  *
  * At 100 TB this is the first lever that matters: it bounds the listing
  * and the task count before any data is read.
  */
/** `values` are the writer-facing string renderings (what partition paths
  * store); `typed` optionally carries the ORIGINAL Spark literal objects
  * in the same order, so stats pruning can compare date/timestamp/decimal
  * predicates losslessly (a timestamp's string form is timezone-ambiguous;
  * the typed instant is not). Callers that only have strings leave it Nil.
  */
final case class PartitionFilter(
    field: String, op: String, values: Seq[String], typed: Seq[Any] = Nil)

/** The include contract [[FsView]] planning consumes: given a relative
  * partition path, may that partition contain matching rows? Implemented
  * by the path-value [[PartitionPruner]] and by the stats-based
  * [[StatsPartitionPruner]] layered on top of it.
  */
trait PartitionInclude {
  def shouldInclude(path: String): Boolean
}

final class PartitionPruner(
    partitionFields: Seq[(String, String)], // (name, typeName: int|long|double|date|string)
    hiveStyle: Boolean,
    urlEncoded: Boolean,
    filters: Seq[PartitionFilter],
    // Which segment renderings stand in for NULL (HoodieConfig
    // .isPartitionNullSentinel). Without a classifier, IS [NOT] NULL
    // filters fail open and sentinel segments under typed fields fail
    // the parse — the pre-null-aware behavior (a caller that cannot
    // name the sentinels must never get exclusion semantics from them).
    nullSentinel: Option[String => Boolean] = None,
    // Which segment renderings are AMBIGUOUS values (HoodieConfig
    // .isPartitionAmbiguousValue): bare 'default' on an upgraded v4+
    // table may be a legacy null dir OR a genuine value — it gets
    // maybe-null semantics below, never exclusion power over null
    // predicates.
    ambiguousValue: Option[String => Boolean] = None
) extends PartitionInclude {
  private val isNullSentinel: String => Boolean = nullSentinel.getOrElse(_ => false)
  private val isAmbiguousValue: String => Boolean = ambiguousValue.getOrElse(_ => false)
  private val relevant: Seq[PartitionFilter] = {
    val names = partitionFields.map(_._1).toSet
    filters.filter(f => names.contains(f.field))
  }
  private val typeOf: Map[String, String] = partitionFields.toMap

  /** Filters on the raw partition-path string — produced by the
    * timestamp-keygen transform (R3), evaluated lexicographically against
    * the un-parsed path.
    */
  private val pathFilters: Seq[PartitionFilter] =
    filters.filter(_.field == "_hoodie_partition_path")

  def isTrivial: Boolean =
    pathFilters.isEmpty && (relevant.isEmpty || partitionFields.isEmpty)

  /** Whether the partition at `path` can contain matching rows. The
    * parse keeps null-sentinel segments as RAW strings (so a sentinel
    * under a typed field no longer voids the whole parse), and
    * [[evaluate]] gives them exact null semantics.
    */
  def shouldInclude(path: String): Boolean = {
    if (isTrivial) return true
    if (!pathFilters.forall(evaluate(path, "string", _))) return false
    if (relevant.isEmpty || partitionFields.isEmpty) return true
    parseWith(path, isNullSentinel) match {
      case None => true // fail open, like partition.rs parse-error handling
      case Some(values) =>
        relevant.forall { f =>
          values.get(f.field) match {
            case None => true
            case Some(v) => evaluate(v, typeOf.getOrElse(f.field, "string"), f)
          }
        }
    }
  }

  /** Parse `path` into field→typed value. None on structural mismatch.
    * Segments satisfying `keepRaw` bypass the typed cast and keep their
    * decoded STRING (the listing surface's sentinel escape).
    */
  private def parseWith(
      path: String, keepRaw: String => Boolean): Option[Map[String, Any]] = {
    if (path.isEmpty) return Some(Map.empty)
    val segs = path.split('/')
    if (segs.length != partitionFields.length) return None
    val pairs = segs.zip(partitionFields).map { case (seg, (name, tpe)) =>
      val raw = if (hiveStyle) {
        val eq = seg.indexOf('=')
        if (eq < 0 || seg.substring(0, eq) != name) return None
        seg.substring(eq + 1)
      } else seg
      val decoded = if (urlEncoded) URLDecoder.decode(raw, StandardCharsets.UTF_8) else raw
      if (keepRaw(decoded)) name -> decoded
      else cast(decoded, tpe) match {
        case Some(v) => name -> v
        case None => return None
      }
    }
    Some(pairs.toMap)
  }

  /** Parse `path` into field→typed value. None on structural mismatch. */
  def parseSegments(path: String): Option[Map[String, Any]] =
    parseWith(path, _ => false)

  /** [[parseSegments]] with a fallback for a SINGLE string-typed
    * partition field whose VALUE contains '/' — timestamp-keygen output
    * formats like yyyy/MM/dd/HH make one field span several path
    * segments, so the field's value is the whole relative path (prefix-
    * stripped when hive-style). Injection sites use this; pruning keeps
    * the strict parse (a mis-split there would mis-prune).
    */
  def parseSegmentsLenient(path: String): Option[Map[String, Any]] =
    parseSegments(path).orElse {
      partitionFields match {
        case Seq((name, "string")) if path.nonEmpty =>
          val raw =
            if (hiveStyle) {
              val pfx = name + "="
              if (path.startsWith(pfx)) path.substring(pfx.length) else return None
            } else path
          Some(Map(name ->
            (if (urlEncoded) URLDecoder.decode(raw, StandardCharsets.UTF_8) else raw)))
        case _ => None
      }
    }

  /** [[parseSegmentsLenient]] for LISTING surfaces (SHOW PARTITIONS): a
    * segment whose raw rendering satisfies `isSentinel` parses as the RAW
    * STRING even under a typed field — the writer renders the null
    * partition with the same sentinel whatever the column type, and a
    * strict typed parse would silently OMIT that partition from the
    * listing. Callers must map sentinel values to NULL (they already
    * check the same predicate); pruning and injection keep the strict
    * parse, where a type-confused value could mis-prune or corrupt rows.
    */
  def parseSegmentsNullable(
      path: String, isSentinel: String => Boolean): Option[Map[String, Any]] =
    parseSegmentsLenient(path).orElse(parseWith(path, isSentinel))

  /** STRICT parse that only raw-keeps null-sentinel segments — exactly
    * the geometry [[shouldInclude]] prunes with. Exact-consumption gates
    * (a pushed filter dropped from the residual because pruning is
    * trusted to be authoritative) must use THIS parse, never the lenient
    * one: the single-string-field fallback accepts multi-segment values
    * (a '/' inside the value) that [[shouldInclude]]'s strict parse
    * fails OPEN on — consuming a filter over a partition pruning cannot
    * exclude would leak its rows into the result.
    */
  def parseSegmentsSentinelRaw(
      path: String, isSentinel: String => Boolean): Option[Map[String, Any]] =
    parseWith(path, isSentinel)

  private def cast(s: String, tpe: String): Option[Any] = tpe match {
    case "int" => s.toIntOption
    case "long" => s.toLongOption
    case "double" => s.toDoubleOption
    case "date" => try Some(LocalDate.parse(s)) catch { case _: Exception => None }
    case _ => Some(s)
  }

  private def cmp(v: Any, lit: String): Option[Int] = v match {
    case i: Int => lit.toIntOption.map(x => i.compare(x))
    case l: Long => lit.toLongOption.map(x => l.compare(x))
    case d: Double => lit.toDoubleOption.map(x => d.compare(x))
    case dt: LocalDate =>
      try Some(dt.compareTo(LocalDate.parse(lit))) catch { case _: Exception => None }
    case s: String => Some(s.compareTo(lit))
    case _ => None
  }

  /** Per-op evaluation with exact null-sentinel semantics; unknown
    * comparisons fail open.
    *
    * A sentinel segment stands for rows whose column is NULL — or, on a
    * STRING column, empty (Hudi's escapePathName renders both the
    * same). So for typed fields a sentinel partition satisfies ONLY
    * `IS NULL` (null matches no comparison, and `NOT IN` over null is
    * NULL → filtered); for string fields its non-null rows are exactly
    * `""`, so comparisons evaluate against the empty string (this also
    * closes the `col = ''` leak: the sentinel partition HOLDS the
    * empty-string rows and must stay planned for that predicate) and
    * both `IS NULL` and `IS NOT NULL` keep it. A parsed NON-sentinel
    * value proves every row non-null: `IS NULL` excludes the partition
    * outright.
    */
  private def evaluate(v: Any, tpe: String, f: PartitionFilter): Boolean = {
    def compare(value: Any): Boolean = {
      def one(op: String, lit: String): Boolean = cmp(value, lit) match {
        case None => true
        case Some(c) => op match {
          case "=" => c == 0
          case "!=" => c != 0
          case "<" => c < 0
          case "<=" => c <= 0
          case ">" => c > 0
          case ">=" => c >= 0
          case _ => true
        }
      }
      f.op match {
        case "in" => f.values.exists(lit => cmp(value, lit).contains(0))
        case "not in" => !f.values.exists(lit => cmp(value, lit).contains(0))
        case op => f.values.headOption.forall(one(op, _))
      }
    }
    v match {
      case s: String if isNullSentinel(s) =>
        f.op match {
          case "isnull" => true
          case "isnotnull" => tpe == "string" // may hold "" rows
          case _ if tpe != "string" => false // rows are NULL: nothing compares
          case _ => compare("") // rows are NULL or "": "" decides
        }
      case s: String if isAmbiguousValue(s) =>
        // maybe-null: a legacy pre-upgrade null dir (rows NULL or "") or
        // genuine rows holding this very string — include whenever either
        // reading could match
        f.op match {
          case "isnull" => true
          case "isnotnull" => true
          case _ => compare(s) || compare("")
        }
      case _ =>
        f.op match {
          // exclusion from a parsed value is only sound when the
          // sentinels are KNOWN (else this value might itself be an
          // unrecognized sentinel) — without a classifier, fail open
          case "isnull" => nullSentinel.isEmpty
          case "isnotnull" => true
          case _ => compare(v)
        }
    }
  }
}

object PartitionPruner {
  def trivial: PartitionPruner = new PartitionPruner(Nil, hiveStyle = false, urlEncoded = false, Nil)
}

/** Partition pruning from the MDT `partition_stats` index: per-partition
  * column (min, max) ranges prune partitions on NON-partition-column
  * predicates BEFORE any file listing happens — the reference leaves this
  * as its declared enhancement (crates/core/src/table/fs_view.rs:80
  * "partition_stats: Enhance PartitionPruner to prune partitions before
  * file listing"); this engine implements it.
  *
  * At 100 TB this is the step ahead of even [[FilePruner]]'s indexed file
  * skipping: a predicate on an ingest-ordered column (event time, id
  * range) drops whole partitions from the plan at the cost of ONE indexed
  * metadata read — no listing round-trips, no footer fetches, no tasks.
  *
  * Semantics: a partition is excluded only when its stats PROVE no row
  * can match (the [[FilePruner]] op rules, shared via [[StatsRange]]).
  * Partitions absent from the stats map, columns without entries, and
  * uncastable literals all fail open; the row-level filter stays
  * authoritative. Unlike per-file column stats, partition stats describe
  * every live row of the partition — base and log files alike, the
  * writer maintains them transactionally per commit — so no base-only
  * gate is needed. Callers gate application to latest-snapshot reads:
  * the index reflects the CURRENT table state, and a time-travel read
  * may need rows whose values a later delete removed from the ranges.
  */
final class StatsPartitionPruner(
    inner: PartitionInclude,
    filters: Seq[PartitionFilter],
    schema: org.apache.spark.sql.types.StructType,
    stats: Map[String, Map[String, (Comparable[Any], Comparable[Any])]]
) extends PartitionInclude {

  private val relevant = filters.filter(f =>
    StatsRange.PrunableOps.contains(f.op) &&
      schema.fieldNames.contains(f.field) && f.values.nonEmpty)

  override def shouldInclude(path: String): Boolean =
    inner.shouldInclude(path) && (relevant.isEmpty || stats.get(path).forall { ranges =>
      relevant.forall(f => StatsRange.permits(schema, f, ranges))
    })
}
