package graft.sources

import org.apache.spark.sql.types.{CalendarIntervalType, DataType, StructType}
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarMap, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** Zero-copy row-selection view over a ColumnVector: logical row `i` maps
  * to physical row `sel(i)` of the delegate. This is how the columnar
  * incremental path applies the EXACT commit-range filter without leaving
  * batch-land — Spark's vectorized parquet reader can only skip row
  * groups/pages, so straddling files (e.g. a COW rewrite carrying
  * pre-range rows) need a per-row residual; wrapping the delegate's
  * vectors in a selection view keeps the scan columnar with no value
  * copies (the same row-id-mapping idea Iceberg's vectorized delete
  * filter uses).
  *
  * Child-vector indexing differs by type: struct (and interval/variant)
  * children are ROW-indexed, so they get the same selection view; array/
  * map children are ELEMENT-indexed via offsets read from the (mapped)
  * parent row, so they must stay unmapped.
  */
final class SelectedColumnVector(base: ColumnVector, sel: Array[Int], len: Int)
    extends ColumnVector(base.dataType) {

  private def m(i: Int): Int = sel(i)

  // the delegate's reader owns vector lifecycle (task-completion close)
  override def close(): Unit = ()

  override def hasNull: Boolean = numNulls > 0
  override lazy val numNulls: Int = {
    var n = 0; var i = 0
    while (i < len) { if (base.isNullAt(sel(i))) n += 1; i += 1 }
    n
  }

  override def isNullAt(i: Int): Boolean = base.isNullAt(m(i))
  override def getBoolean(i: Int): Boolean = base.getBoolean(m(i))
  override def getByte(i: Int): Byte = base.getByte(m(i))
  override def getShort(i: Int): Short = base.getShort(m(i))
  override def getInt(i: Int): Int = base.getInt(m(i))
  override def getLong(i: Int): Long = base.getLong(m(i))
  override def getFloat(i: Int): Float = base.getFloat(m(i))
  override def getDouble(i: Int): Double = base.getDouble(m(i))
  override def getArray(i: Int): ColumnarArray = base.getArray(m(i))
  override def getMap(i: Int): ColumnarMap = base.getMap(m(i))
  override def getDecimal(i: Int, precision: Int, scale: Int): org.apache.spark.sql.types.Decimal =
    base.getDecimal(m(i), precision, scale)
  override def getUTF8String(i: Int): UTF8String = base.getUTF8String(m(i))
  override def getBinary(i: Int): Array[Byte] = base.getBinary(m(i))

  private lazy val rowIndexedChildren: Boolean = base.dataType match {
    case _: StructType | CalendarIntervalType => true
    case dt: DataType if dt.typeName == "variant" => true
    case _ => false
  }
  override def getChild(ordinal: Int): ColumnVector =
    if (rowIndexedChildren) new SelectedColumnVector(base.getChild(ordinal), sel, len)
    else base.getChild(ordinal)
}
