package graft.log

import org.apache.avro.{Schema => AvroSchema}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Aligns decoded log-block records (Avro or parquet) to a target table
  * schema by field name, with safe numeric widening between the writer's
  * types and the parquet-footer-derived table schema.
  */
object RowAlign {

  def coerce(v: Any, target: DataType): Any = (v, target) match {
    case (null, _) => null
    case (i: Int, LongType) => i.toLong
    case (i: Int, DoubleType) => i.toDouble
    case (l: Long, DoubleType) => l.toDouble
    case (f: Float, DoubleType) => f.toDouble
    case (i: Int, ShortType) => i.toShort
    case (i: Int, ByteType) => i.toByte
    // HALF_UP matches Spark's own Decimal.changePrecision rounding; a
    // bare setScale throws ArithmeticException("Rounding necessary")
    // whenever a log-block decimal needs scale reduction
    case (i: Int, d: DecimalType) =>
      new java.math.BigDecimal(i).setScale(d.scale, java.math.RoundingMode.HALF_UP)
    case (l: Long, d: DecimalType) =>
      new java.math.BigDecimal(l).setScale(d.scale, java.math.RoundingMode.HALF_UP)
    case (bd: java.math.BigDecimal, d: DecimalType) =>
      bd.setScale(d.scale, java.math.RoundingMode.HALF_UP)
    case (other, _) => other
  }

  /** Avro record → Row in `target` field order. */
  def fromAvro(rec: org.apache.avro.generic.GenericRecord, avro: AvroSchema, target: StructType): Row =
    Row.fromSeq(target.fields.map { f =>
      val af = avro.getField(f.name)
      if (af == null) null
      else coerce(AvroConvert.toSparkValue(rec.get(af.pos()), af.schema()), f.dataType)
    }.toIndexedSeq)

  /** External Row (with `from` schema) → Row in `target` field order. */
  def fromRow(src: Row, fromIndex: Map[String, Int], target: StructType): Row =
    Row.fromSeq(target.fields.map { f =>
      fromIndex.get(f.name).map(i => coerce(src.get(i), f.dataType)).orNull
    }.toIndexedSeq)

  /** All data rows of a block, aligned to `target`. */
  def blockRows(b: LogBlock, target: StructType): Iterator[Row] = b.blockType match {
    case LogFormat.AvroDataBlock | LogFormat.CdcDataBlock =>
      val avro = b.dataSchema.get
      b.dataRecords.iterator.map(fromAvro(_, avro, target))
    case LogFormat.ParquetDataBlock =>
      val (schema, rows) = ParquetBlock.decode(b.rawContent)
      val idx = schema.fieldNames.zipWithIndex.toMap
      rows.iterator.map(fromRow(_, idx, target))
    case _ => Iterator.empty
  }
}
