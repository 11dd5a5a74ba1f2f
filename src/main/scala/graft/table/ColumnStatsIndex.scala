package graft.table

import graft.core.HoodieConfig
import graft.hfile.HFileReader
import graft.log.{InstantRange, LogFileParser, LogFormat}
import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import scala.collection.mutable

/** One decoded `column_stats`-partition entry: (file, column) → min/max
  * range plus value/null counts (the public HoodieMetadata.avsc
  * `HoodieMetadataColumnStats` record; the reference enumerates the
  * partition — records.rs:113 ColumnStats = 3 — but never decodes it,
  * so this is a beyond-reference read surface like the record index).
  */
final case class ColumnStatEntry(
    fileName: String,
    columnName: String,
    min: Option[Any],
    max: Option[Any],
    valueCount: Option[Long],
    nullCount: Option[Long],
    isTightBound: Boolean
)

/** A [[ColumnStatsIndex.load]] result: entries plus the MDT commit they
  * were read at.
  */
final case class ColumnStatsLookup(
    asOf: String,
    entries: Vector[ColumnStatEntry]
) {

  /** fileName → columnName → (min, max) with both bounds present and
    * mutually comparable — the shape [[graft.fs.FilePruner]] consumes.
    * Loose (non-tight) bounds are still conservative ranges, so they
    * prune safely; entries lacking either bound are dropped (fail-open
    * at the pruner).
    */
  lazy val pruningStats: Map[String, Map[String, (Comparable[Any], Comparable[Any])]] =
    statsMap(entries)

  /** Like [[pruningStats]] but ONLY tight-bound entries — bounds that
    * are exact extremes, usable as ANSWERS (MIN/MAX pushdown), not just
    * conservative ranges. Loose bounds prune safely but may lie outside
    * the true extremes, so they must never be served as results.
    */
  lazy val tightStats: Map[String, Map[String, (Comparable[Any], Comparable[Any])]] =
    statsMap(entries.filter(_.isTightBound))

  /** fileName → EXACT row count, derivable when some column of the file
    * has `nullCount == 0`: its `valueCount` then equals the row count
    * under EITHER public interpretation of valueCount (parquet's
    * chunk value count includes nulls — verified == footer row count on
    * the reference's real v8 trips bytes — and a nulls-excluded writer
    * agrees exactly when the column has no nulls). On populated-meta
    * tables `_hoodie_record_key` is never null, so coverage is the norm.
    * Files whose qualifying columns DISAGREE are dropped (fail-open to
    * the footer path) — counts are answers, never guesses.
    */
  lazy val rowCounts: Map[String, Long] =
    entries.iterator
      .filter(e => e.nullCount.contains(0L) && e.valueCount.isDefined)
      .map(e => e.fileName -> e.valueCount.get)
      .toVector.groupBy(_._1)
      .collect { case (f, vs) if vs.map(_._2).distinct.size == 1 => f -> vs.head._2 }

  /** fileName → columns with PROVEN zero nulls (`nullCount == 0` —
    * unambiguous under every public valueCount interpretation). Feeds
    * `IS NULL` pruning: such a file cannot contain a matching row. A
    * file appears as a key even when no column qualifies, marking it
    * index-COVERED so the pruner skips the footer read for it.
    */
  lazy val zeroNullCols: Map[String, Set[String]] =
    entries.groupBy(_.fileName).view.mapValues(es =>
      es.filter(_.nullCount.contains(0L)).map(_.columnName).toSet).toMap

  /** fileName → columnName → nullCount where recorded — with
    * [[rowCounts]] this serves `COUNT(col)` pushdown as
    * rows − nulls per file.
    */
  lazy val nullCounts: Map[String, Map[String, Long]] =
    entries.groupBy(_.fileName).view.mapValues(es =>
      es.flatMap(e => e.nullCount.map(e.columnName -> _)).toMap).toMap

  private def statsMap(
      es: Vector[ColumnStatEntry]
  ): Map[String, Map[String, (Comparable[Any], Comparable[Any])]] =
    es.iterator
      .flatMap { e =>
        (e.min, e.max) match {
          case (Some(mn: Comparable[_]), Some(mx: Comparable[_]))
              if mn.getClass == mx.getClass =>
            Some((e.fileName, e.columnName,
              mn.asInstanceOf[Comparable[Any]], mx.asInstanceOf[Comparable[Any]]))
          case _ => None
        }
      }
      .toVector
      .groupBy(_._1)
      .view.mapValues(_.map(t => t._2 -> (t._3, t._4)).toMap)
      .toMap
}

/** Reader for the metadata table's `column_stats` partition: per
  * (file, column) min/max ranges maintained transactionally with the
  * data — at 100 TB the difference between ONE indexed metadata read and
  * a footer fetch per candidate file (R2's parallel footer reads are
  * latency-bound on object stores; the reference makes the same trade at
  * fs_view.rs:154-223 and Hudi's own readers consult this partition for
  * data skipping).
  *
  * Values decode through the avro schema EMBEDDED in the index HFiles
  * (typed `*Wrapper` union members), so the decode tracks whatever
  * schema the writer used.
  */
object ColumnStatsIndex {

  val PartitionName = "column_stats"

  def isAvailable(config: HoodieConfig): Boolean =
    config.getOrElse("hoodie.table.metadata.partitions", "")
      .split(",").map(_.trim).contains(PartitionName)

  /** Decoded-lookup memo misses (full partition decodes) — monotonic,
    * for tests pinning "a repeat plan decodes nothing".
    */
  val decodes = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Decoded lookups per (table, partition, resolved MDT commit). The
    * byte cache ([[IndexIoCache]]) already removes repeat IO; this
    * removes the repeat full-partition avro decode + map assembly that
    * still made every planning pass O(index entries) — at 100k files
    * that is the dominant plan-time cost for a repeat point query.
    * Keyed by the RESOLVED commit, so an MDT advance (or a different
    * as-of) naturally re-decodes while repeat plans pay only the
    * timeline/partition listing. Count-bounded LRU: one decoded lookup
    * for a 100k-file table is tens of MB, and a handful of hot tables
    * is the realistic working set.
    */
  private val lookupMemo =
    new java.util.LinkedHashMap[(String, String, String), ColumnStatsLookup](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, String), ColumnStatsLookup]): Boolean =
        size > sys.props.get("graft.colstats.lookup.cache.entries")
          .flatMap(_.toIntOption).getOrElse(8)
    }

  /** All column-stat entries as of the MDT's latest commit, HFile log
    * blocks overlaid in commit order (newer wins per record key,
    * tombstones and isDeleted entries drop). Throws on structural
    * problems — an advertised-but-unreadable index must surface, never
    * read as "no stats"; callers catch and fall back to footers.
    */
  def load(
      dataTableBase: String,
      hadoopConf: Configuration,
      partition: String = PartitionName,
      asOf: Option[String] = None): ColumnStatsLookup = {
    val (latest, slices) = MetadataTable.openPartition(dataTableBase, partition, hadoopConf, asOf)
    val memoKey = (dataTableBase, partition, latest)
    val memoized = lookupMemo.synchronized(Option(lookupMemo.get(memoKey)))
    memoized match {
      case Some(l) => l
      case None =>
        decodes.incrementAndGet()
        val l = decodeAll(partition, latest, slices, hadoopConf)
        lookupMemo.synchronized(lookupMemo.put(memoKey, l))
        l
    }
  }

  private def decodeAll(
      partition: String,
      latest: String,
      slices: Vector[graft.fs.FileSlice],
      hadoopConf: Configuration): ColumnStatsLookup = {
    def readFully(p: Path): Array[Byte] = IndexIoCache.bytes(p, hadoopConf)
    val range = InstantRange.upTo(latest)
    val out = mutable.LinkedHashMap.empty[String, Option[ColumnStatEntry]]
    for (slice <- slices) {
      val baseFile = slice.baseFile.getOrElse(
        throw new IllegalStateException(s"$partition slice lacks a base HFile: $slice"))
      val baseReader = new HFileReader(readFully(new Path(baseFile.path)))
      val schema = new AvroSchema.Parser().parse(baseReader.avroSchemaJson.getOrElse(
        throw new IllegalStateException(s"$partition base HFile carries no avro schema")))
      val datumReader = new GenericDatumReader[GenericRecord](schema)
      for (rec <- baseReader.records)
        out(rec.key) = decode(rec.value, rec.isDeleted, datumReader)
      for (lf <- slice.logFiles.sortBy(_.orderingKey)) {
        val blocks = LogFileParser.applyRollbacks(
          LogFileParser.parse(readFully(new Path(lf.path)), range))
        for (b <- blocks if b.blockType == LogFormat.HfileDataBlock && b.rawContent.nonEmpty) {
          val logReader = new HFileReader(b.rawContent)
          for (rec <- logReader.records)
            out(rec.key) = decode(rec.value, rec.isDeleted, datumReader)
        }
      }
    }
    ColumnStatsLookup(latest, out.valuesIterator.flatten.toVector)
  }

  private def decode(
      value: Array[Byte], deleted: Boolean,
      reader: GenericDatumReader[GenericRecord]
  ): Option[ColumnStatEntry] = {
    if (deleted || value.isEmpty) return None
    val rec = reader.read(null, DecoderFactory.get().binaryDecoder(value, null))
    Option(rec.get("ColumnStatsMetadata")).collect { case cs: GenericRecord =>
      def str(f: String): Option[String] = Option(cs.get(f)).map(_.toString)
      def lng(f: String): Option[Long] = cs.get(f) match {
        case l: java.lang.Long => Some(l.longValue())
        case i: java.lang.Integer => Some(i.longValue())
        case _ => None
      }
      def bool(f: String): Boolean = cs.get(f) match {
        case b: java.lang.Boolean => b.booleanValue()
        case _ => false
      }
      if (bool("isDeleted")) None
      else Some(ColumnStatEntry(
        str("fileName").getOrElse(""),
        str("columnName").getOrElse(""),
        unwrap(cs.get("minValue")),
        unwrap(cs.get("maxValue")),
        lng("valueCount"),
        lng("nullCount"),
        bool("isTightBound")))
    }.flatten
  }

  /** Unwrap a `*Wrapper` union member to a plain comparable JVM value.
    * Date/LocalDate stay as epoch-day Ints and timestamp-micros as Longs
    * — the same representations parquet footer statistics expose, so the
    * pruner compares like with like. Unknown wrappers map to None
    * (fail-open).
    */
  private def unwrap(v: Any): Option[Any] = v match {
    case null => None
    case w: GenericRecord =>
      val inner = w.get("value")
      w.getSchema.getName match {
        case "BooleanWrapper" | "IntWrapper" | "LongWrapper" | "FloatWrapper" |
            "DoubleWrapper" | "DateWrapper" | "TimeMicrosWrapper" |
            "TimestampMicrosWrapper" | "LocalDateWrapper" => Option(inner)
        case "StringWrapper" => Option(inner).map(_.toString)
        case "BytesWrapper" => None // byte ranges aren't pruned (no literal form)
        case "DecimalWrapper" =>
          // avro bytes with a decimal logical type: unscaled big-endian
          // two's-complement + the scale declared on the wrapper's value
          // field — decoded to a java BigDecimal, the same representation
          // StatsRange.literal produces for DecimalType predicates
          (inner, w.getSchema.getField("value").schema().getLogicalType) match {
            case (bb: java.nio.ByteBuffer, dec: org.apache.avro.LogicalTypes.Decimal) =>
              val bytes = new Array[Byte](bb.remaining())
              bb.duplicate().get(bytes)
              Some(new java.math.BigDecimal(new java.math.BigInteger(bytes), dec.getScale))
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }
}

/** Reader for the metadata table's `partition_stats` partition: per
  * (partition, column) min/max ranges over EVERY live row of the
  * partition, in the same public `HoodieMetadataColumnStats` shape as
  * the column-stats index (MetadataRecordType::PartitionStats = 6,
  * reference records.rs:120-121) with the `fileName` field carrying the
  * partition path — verified against the reference's real v8 trips
  * fixture bytes (partition-stats HFile, keys per (column, partition),
  * `fileName` = "city=chennai" etc.).
  *
  * The reference enumerates this partition but leaves its use as a
  * declared enhancement (fs_view.rs:80); here it feeds
  * [[graft.fs.StatsPartitionPruner]] so non-partition-column predicates
  * prune partitions BEFORE listing — the earliest possible skip at
  * 100 TB: one indexed metadata read instead of per-partition listings
  * and per-file footers.
  */
object PartitionStatsIndex {

  val PartitionName = "partition_stats"

  def isAvailable(config: HoodieConfig): Boolean =
    config.getOrElse("hoodie.table.metadata.partitions", "")
      .split(",").map(_.trim).contains(PartitionName)

  /** partitionPath → columnName → (min, max), as of the MDT's latest
    * commit. Throws on structural problems; callers catch and fall back
    * to unpruned planning.
    */
  def load(
      dataTableBase: String,
      hadoopConf: Configuration
  ): Map[String, Map[String, (Comparable[Any], Comparable[Any])]] =
    ColumnStatsIndex.load(dataTableBase, hadoopConf, PartitionName).pruningStats
}
