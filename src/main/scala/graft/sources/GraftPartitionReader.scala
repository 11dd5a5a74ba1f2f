package graft.sources

import graft.log.{InstantRange, LogFileParser, LogFormat}
import graft.util.SerializableConf
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.types.{ByteType, DataType, DateType, DoubleType, FloatType, IntegerType, LongType, ShortType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Executor-side slice reader: base parquet rows via Spark's delegated
  * parquet reader, plus — for MOR slices — a streaming per-slice merge:
  * log records are decoded into an in-memory map keyed by record key (the
  * small side; Hudi log files are bounded by the writer's roll size) and
  * the base file STREAMS against it, so memory is proportional to the
  * delta, not the file group, and the merge needs no shuffle at all. This
  * mirrors the reference's per-slice FileGroupReader execution
  * (crates/core/src/file_group/reader.rs:205-279) and is the no-shuffle
  * complement to the DataFrame-level [[graft.table.MorMerge]].
  */
class GraftReaderFactory(
    readFn: PartitionedFile => Iterator[InternalRow],
    widenedJson: String,
    requiredJson: String,
    orderingField: Option[String],
    mergeStrategy: String,
    conf: SerializableConf,
    endTs: Option[String],
    partitionSchemaJson: Option[String] = None,
    hiveStyle: Boolean = false,
    urlEncoded: Boolean = false,
    columnar: Boolean = false,
    populatesMetaFields: Boolean = true,
    limit: Option[Int] = None,
    rangeFilterColumnar: Boolean = false,
    emitDeletes: Boolean = false
) extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = columnar

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    val counters = new ReaderCounters
    val chained = new ChainedPartitionReader[InternalRow](p.slices.map(sl => () =>
      new GraftPartitionReader(sl, readFn, widenedJson, requiredJson,
        orderingField, mergeStrategy, conf, p.commitEnd.orElse(endTs), p.commitStart,
        partitionSchemaJson, hiveStyle, urlEncoded, populatesMetaFields, counters,
        emitDeletes)),
      () => counters.snapshot)
    limit.fold(chained: PartitionReader[InternalRow])(new LimitedPartitionReader(chained, _))
  }

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    val counters = new ReaderCounters
    // no batch truncation for a pushed limit: Spark's own limit stops
    // pulling batches, which bounds work without slicing vectors
    new ChainedPartitionReader(p.slices.map(sl => () =>
      new GraftColumnarReader(sl, readFn, widenedJson, requiredJson,
        partitionSchemaJson, hiveStyle, urlEncoded,
        commitStart = if (rangeFilterColumnar) p.commitStart else None,
        commitEnd = if (rangeFilterColumnar) p.commitEnd.orElse(endTs) else None,
        counters = counters)),
      () => counters.snapshot)
  }
}

/** Sequential composition of per-slice readers — one InputPartition holds
  * a CHUNK of slices (table/mod.rs:69-86 split_into_chunks), so task count
  * stays bounded on many-slice tables. Sub-readers are created lazily and
  * closed as soon as they drain.
  */
class ChainedPartitionReader[T](
    parts: Seq[() => PartitionReader[T]],
    metrics: () => Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
      () => Array.empty
) extends PartitionReader[T] {
  private var idx = 0
  private var cur: PartitionReader[T] = _

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    metrics()

  override def next(): Boolean = {
    while (true) {
      if (cur == null) {
        if (idx >= parts.size) return false
        cur = parts(idx)()
        idx += 1
      }
      if (cur.next()) return true
      cur.close()
      cur = null
    }
    false
  }

  override def get(): T = cur.get()

  override def close(): Unit = if (cur != null) { cur.close(); cur = null }
}

/** Pushed-limit row budget (L1, hudi_exec.rs:127-168): stop the partition
  * after `limit` rows — Spark's global limit still applies above (partial
  * pushdown contract).
  */
class LimitedPartitionReader(inner: PartitionReader[InternalRow], limit: Int)
    extends PartitionReader[InternalRow] {
  private var seen = 0
  override def next(): Boolean = seen < limit && inner.next() && { seen += 1; true }
  override def get(): InternalRow = inner.get()
  override def close(): Unit = inner.close()
  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    inner.currentMetricsValues()
}

/** Typed partition-value parsing shared by the row and columnar readers:
  * dropped partition columns (P6) are re-derived from the slice's
  * partition path and travel through the parquet delegate's
  * partitionValues mechanism.
  */
private[sources] object PartitionValues {
  def forSlice(
      slice: graft.fs.FileSlice,
      partitionSchemaJson: Option[String],
      hiveStyle: Boolean,
      urlEncoded: Boolean): InternalRow = partitionSchemaJson match {
    case None => InternalRow.empty
    case Some(json) =>
      val ps = DataType.fromJson(json).asInstanceOf[StructType]
      val fieldTypes = ps.fields.map(f => f.name -> (f.dataType match {
        case IntegerType | ShortType | ByteType => "int"
        case LongType => "long"
        case DoubleType | FloatType => "double"
        case DateType => "date"
        case _ => "string"
      })).toSeq
      val parsed = new graft.fs.PartitionPruner(fieldTypes, hiveStyle, urlEncoded, Nil)
        .parseSegmentsLenient(slice.partitionPath).getOrElse(Map.empty)
      val vals = ps.fields.map { f =>
        val ext = parsed.get(f.name).map {
          case d: java.time.LocalDate => java.sql.Date.valueOf(d)
          case other => other
        }.orNull
        CatalystTypeConverters.createToCatalystConverter(f.dataType)(ext)
      }
      new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }
}

/** Columnar slice reader for log-free scans (COW / MOR read-optimized /
  * MOR snapshots whose planned slices carry no logs): Spark's vectorized
  * parquet reader yields `ColumnarBatch`es through the
  * `Iterator[InternalRow]` erasure contract (the same cast
  * `FileSourceScanExec` performs), and the only work here is permuting
  * columns when the delegate's output order (required-minus-dropped ++
  * partition cols) differs from the query's projection order. This is the
  * Spark analog of the reference routing COW scans to DataFusion's native
  * `ParquetSource` (crates/datafusion/src/lib.rs:399-417, 626-695).
  */
class GraftColumnarReader(
    slice: graft.fs.FileSlice,
    readFn: PartitionedFile => Iterator[InternalRow],
    widenedJson: String,
    requiredJson: String,
    partitionSchemaJson: Option[String],
    hiveStyle: Boolean,
    urlEncoded: Boolean,
    commitStart: Option[String] = None,
    commitEnd: Option[String] = None,
    counters: ReaderCounters = new ReaderCounters
) extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

  counters.slicesRead += 1

  private val widened = DataType.fromJson(widenedJson).asInstanceOf[StructType]
  private val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
  private val outIdx: Array[Int] = required.fields.map(f => widened.fieldIndex(f.name))
  private val identityProjection = outIdx.sameElements(widened.fields.indices)

  // exact incremental range residual (general columnar incremental): the
  // pushed parquet range predicate only skips row groups/pages, so a
  // straddling file (a COW rewrite carrying pre-range rows) still emits
  // out-of-range rows — selected out here per batch, in batch-land
  private val startU = commitStart.map(UTF8String.fromString).orNull
  private val endU = commitEnd.map(UTF8String.fromString).orNull
  private val ctIdx: Int =
    if (startU != null || endU != null) widened.fieldIndex("_hoodie_commit_time") else -1

  private lazy val batches: Iterator[ColumnarBatch] = {
    // columnar routing requires a log-free slice, which always has a base
    val bf = slice.baseFile.getOrElse(
      throw new IllegalStateException(s"columnar reader on a base-less slice: $slice"))
    counters.baseFilesRead += 1
    val pf = PartitionedFile(
      PartitionValues.forSlice(slice, partitionSchemaJson, hiveStyle, urlEncoded),
      SparkPath.fromPathString(bf.path),
      0L,
      bf.size)
    readFn(pf).asInstanceOf[Iterator[ColumnarBatch]]
  }

  private def project(b: ColumnarBatch): ColumnarBatch =
    if (identityProjection) b
    else new ColumnarBatch(outIdx.map(b.column): Array[ColumnVector], b.numRows())

  /** Project, applying the commit-range selection when configured. An
    * all-in-range batch (the overwhelmingly common case — most files are
    * single-commit) passes through untouched; a straddling batch gets a
    * zero-copy [[SelectedColumnVector]] view; an all-out batch returns
    * null and is skipped.
    */
  private def selectProject(b: ColumnarBatch): ColumnarBatch = {
    if (ctIdx < 0) return project(b)
    val ct = b.column(ctIdx)
    val n = b.numRows()
    val sel = new Array[Int](n)
    var m = 0
    var i = 0
    while (i < n) {
      val v = if (ct.isNullAt(i)) null else ct.getUTF8String(i)
      if (v != null &&
          (startU == null || v.compareTo(startU) > 0) &&
          (endU == null || v.compareTo(endU) <= 0)) { sel(m) = i; m += 1 }
      i += 1
    }
    if (m == n) project(b)
    else if (m == 0) null
    else new ColumnarBatch(
      outIdx.map(j => new SelectedColumnVector(b.column(j), sel, m): ColumnVector), m)
  }

  private var current: ColumnarBatch = _

  override def next(): Boolean = {
    while (batches.hasNext) {
      val out = selectProject(batches.next())
      if (out != null) { current = out; return true }
    }
    false
  }

  override def get(): ColumnarBatch = current

  // vector lifecycle belongs to the delegate's reader, which registers its
  // own task-completion close; the permuted wrapper shares those vectors
  override def close(): Unit = ()
}

class GraftPartitionReader(
    slice: graft.fs.FileSlice,
    readFn: PartitionedFile => Iterator[InternalRow],
    widenedJson: String,
    requiredJson: String,
    orderingField: Option[String],
    mergeStrategy: String,
    conf: SerializableConf,
    endTs: Option[String],
    commitStart: Option[String] = None,
    partitionSchemaJson: Option[String] = None,
    hiveStyle: Boolean = false,
    urlEncoded: Boolean = false,
    populatesMetaFields: Boolean = true,
    counters: ReaderCounters = new ReaderCounters,
    emitDeletes: Boolean = false
) extends PartitionReader[InternalRow] {

  counters.slicesRead += 1

  private val widened = DataType.fromJson(widenedJson).asInstanceOf[StructType]
  private val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
  private val outIdx: Array[Int] = required.fields.map(f => widened.fieldIndex(f.name))
  private val identityProjection = outIdx.sameElements(widened.fields.indices)

  /** Parsed typed partition values for dropped partition columns (P6). */
  private lazy val partitionValuesRow: InternalRow =
    PartitionValues.forSlice(slice, partitionSchemaJson, hiveStyle, urlEncoded)

  private def baseIter: Iterator[InternalRow] = slice.baseFile match {
    case None => Iterator.empty // log-only slice: rows come from the merge map
    case Some(bf) =>
      counters.baseFilesRead += 1
      val pf = PartitionedFile(
        partitionValuesRow,
        SparkPath.fromPathString(bf.path),
        0L,
        bf.size)
      readFn(pf)
  }

  /** Incremental / streaming micro-batches carry a `(start, end]` commit
    * range: the P5 row filter applied to the widened rows pre-projection —
    * but only when the table populates meta fields; without them every
    * `_hoodie_commit_time` is null and the mask would drop all rows
    * (file_group/reader.rs:652-701 gates identically).
    */
  private def commitRangeFilter(it: Iterator[InternalRow]): Iterator[InternalRow] =
    commitStart match {
      case None => it
      case Some(_) if !populatesMetaFields => it
      case Some(start) =>
        val startU = UTF8String.fromString(start)
        val endU = endTs.map(UTF8String.fromString)
        it.filter { r =>
          !r.isNullAt(commitIdx) && {
            val c = r.getUTF8String(commitIdx)
            c.compareTo(startU) > 0 && endU.forall(c.compareTo(_) <= 0)
          }
        }
    }

  private val rows: Iterator[InternalRow] =
    if (!slice.hasLogFiles) commitRangeFilter(baseIter).map(project)
    else commitRangeFilter(mergedIter).map(project)

  private def project(row: InternalRow): InternalRow =
    if (identityProjection) row
    else {
      val vals = new Array[Any](outIdx.length)
      var i = 0
      while (i < outIdx.length) {
        vals(i) = row.get(outIdx(i), widened.fields(outIdx(i)).dataType)
        i += 1
      }
      new GenericInternalRow(vals)
    }

  // ---- merge machinery ---------------------------------------------------

  private lazy val keyIdx = widened.fieldIndex("_hoodie_record_key")
  private lazy val seqIdx = widened.fieldIndex("_hoodie_commit_seqno")
  private lazy val commitIdx = widened.fieldIndex("_hoodie_commit_time")
  private lazy val ordIdx = orderingField.map(widened.fieldIndex)
  private lazy val ordType = ordIdx.map(i => widened.fields(i).dataType)

  /** Arrow-row-style comparison: null is lowest; same-type Comparables. */
  private def cmpAny(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (x: Comparable[_], y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
    case _ => 0
  }

  private def orderingOf(r: InternalRow): Any =
    ordIdx.map(i => if (r.isNullAt(i)) null else r.get(i, ordType.get)).orNull

  private def seqnoOf(r: InternalRow): Any =
    if (r.isNullAt(seqIdx)) null else r.getUTF8String(seqIdx)

  private def commitOf(r: InternalRow): Any =
    if (r.isNullAt(commitIdx)) null else r.getUTF8String(commitIdx)

  /** OVERWRITE_WITH_LATEST version pick: desc (ordering, seqno). */
  private def newerThan(a: InternalRow, b: InternalRow): Boolean = {
    val c = cmpAny(orderingOf(a), orderingOf(b))
    if (c != 0) c > 0 else cmpAny(seqnoOf(a), seqnoOf(b)) > 0
  }

  private final class DeleteInfo(
      var eventOrd: Any, var commitOrd: Any, var eventZero: Boolean) {
    /** ordering.rs:41-51 incl. the integer-zero special case. */
    def winsOver(recEvent: Any, recCommit: Any): Boolean =
      if (eventZero) cmpAny(commitOrd, recCommit) > 0
      else {
        val c = cmpAny(eventOrd, recEvent)
        c > 0 || (c == 0 && cmpAny(commitOrd, recCommit) > 0)
      }
  }

  private def isIntegralZero(v: Any): Boolean = v match {
    case i: Int => i == 0
    case l: Long => l == 0L
    case s: Short => s == 0
    case b: Byte => b == 0
    case _ => false
  }

  private def appendOnly: Boolean = mergeStrategy == "APPEND_ONLY"

  /** Decode the slice's log files once. OVERWRITE_WITH_LATEST keys rows
    * to latest-per-record-key + delete max-orderings; APPEND_ONLY keeps
    * every version verbatim (record keys may not even be populated).
    * Rollback-aware, range-bounded.
    */
  private lazy val (logLatest, deletes, logAll) = {
    val range = InstantRange(commitStart, endTs)
    val blocks = {
      val bs = slice.logFiles.sortBy(_.orderingKey).flatMap { lf =>
        val p = new Path(lf.path)
        // actual length, not the planned size: writers append to log
        // files and MDT-recorded sizes can lag the physical file
        val bytes = graft.util.ReadFully(p, conf.value)
        counters.logFilesRead += 1
        counters.logBytesDecoded += bytes.length
        LogFileParser.parse(bytes, range)
      }
      LogFileParser.applyRollbacks(bs.toVector)
    }
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(widened)
    val latest = mutable.HashMap.empty[String, InternalRow]
    val dels = mutable.HashMap.empty[String, DeleteInfo]
    val all = mutable.ArrayBuffer.empty[InternalRow]
    for (b <- blocks) {
      if (b.blockType == LogFormat.AvroDataBlock || b.blockType == LogFormat.ParquetDataBlock ||
          b.blockType == LogFormat.CdcDataBlock) {
        for (ext <- graft.log.RowAlign.blockRows(b, widened)) {
          val row = toCatalyst(ext).asInstanceOf[InternalRow]
          counters.logRecordsBuffered += 1
          if (appendOnly) all += row
          else {
            val key = if (row.isNullAt(keyIdx)) "" else row.getString(keyIdx)
            latest.get(key) match {
              case Some(prev) if !newerThan(row, prev) => // keep prev
              case _ => latest(key) = row
            }
          }
        }
      } else if (b.blockType == LogFormat.DeleteBlock) {
        val commit = UTF8String.fromString(b.instantTime)
        for ((key, _, ordRaw) <- b.deleteRecords) {
          counters.deleteRecordsSeen += 1
          val ord = toCatalystScalar(ordRaw)
          val zero = isIntegralZero(ordRaw)
          dels.get(key) match {
            case Some(info) =>
              if (cmpAny(ord, info.eventOrd) > 0) {
                info.eventOrd = ord; info.eventZero = zero
              }
              if (cmpAny(commit, info.commitOrd) > 0) info.commitOrd = commit
            case None => dels(key) = new DeleteInfo(ord, commit, zero)
          }
        }
      }
    }
    (latest, dels, all)
  }

  private def toCatalystScalar(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    // delete-record ordering values arrive as JVM types from the Avro
    // union codec; row-side values are Catalyst types — align the decimal
    // branch or cmpAny's compareTo throws ClassCastException mid-merge
    case d: java.math.BigDecimal => org.apache.spark.sql.types.Decimal(d)
    case d: BigDecimal => org.apache.spark.sql.types.Decimal(d)
    case other => other
  }

  private def deleteWins(row: InternalRow): Boolean = {
    val key = if (row.isNullAt(keyIdx)) "" else row.getString(keyIdx)
    deletes.get(key).exists(_.winsOver(orderingOf(row), commitOf(row)))
  }

  /** Streamed merge: base rows checked against the log map; survivors of
    * the log map (log-only inserts) appended at the end. With
    * `emitDeletes`, keys whose in-range delete is the slice's final
    * state additionally surface as tombstone rows AFTER the survivors
    * (the `++` operands are by-name, so the alive-key set is complete by
    * the time the tombstone iterator is consumed).
    */
  private def mergedIter: Iterator[InternalRow] =
    if (appendOnly) baseIter ++ logAll.iterator
    else {
      val consumed = mutable.HashSet.empty[String]
      val aliveDeleteKeys = mutable.HashSet.empty[String]
      def keep(key: String): Unit =
        if (emitDeletes && deletes.contains(key)) aliveDeleteKeys += key
      val fromBase = baseIter.flatMap { row =>
        val key = if (row.isNullAt(keyIdx)) "" else row.getString(keyIdx)
        val winner = logLatest.get(key) match {
          case Some(logRow) =>
            consumed += key
            if (newerThan(logRow, row)) logRow else row.copy()
          case None => row
        }
        if (deleteWins(winner)) None else { keep(key); Some(winner) }
      }
      val fromLogOnly = logLatest.iterator.collect {
        case (key, row) if !consumed.contains(key) && !deleteWins(row) =>
          keep(key); row
      }
      if (!emitDeletes) fromBase ++ fromLogOnly
      else fromBase ++ fromLogOnly ++ tombstoneIter(aliveDeleteKeys)
    }

  /** Tombstone rows for `stream.emit.deletes`: data columns null, meta
    * columns carrying (delete commit time, record key, partition path)
    * plus the delete's ordering value — the delete-visibility contract a
    * per-commit micro-batch consumer needs (a delete-only commit
    * otherwise surfaces NO rows and downstream latest-wins state keeps
    * the deleted keys forever). Only keys with no surviving in-range row
    * qualify: a later in-range upsert re-inserts the key, so no
    * tombstone.
    */
  private def tombstoneIter(alive: collection.Set[String]): Iterator[InternalRow] = {
    // the partition-path column can be projection-pruned from the
    // widened schema — populate it only when present
    lazy val partIdx = widened.fieldNames.indexOf("_hoodie_partition_path") match {
      case -1 => None
      case i => Some(i)
    }
    deletes.iterator.collect { case (key, info) if !alive.contains(key) =>
      val vals = new Array[Any](widened.fields.length)
      vals(keyIdx) = UTF8String.fromString(key)
      vals(commitIdx) = info.commitOrd
      partIdx.foreach(i => vals(i) = UTF8String.fromString(slice.partitionPath))
      ordIdx.foreach(i => vals(i) = info.eventOrd)
      new GenericInternalRow(vals)
    }
  }

  // ---- PartitionReader contract ------------------------------------------

  private var current: InternalRow = _

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false

  override def get(): InternalRow = current

  override def close(): Unit = ()
}
