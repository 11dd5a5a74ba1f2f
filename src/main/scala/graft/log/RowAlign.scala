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

  /** Recursively align a decoded value to `target`, mapping nested
    * STRUCT fields BY NAME via the source type. This exists because
    * DSv2 nested-schema pruning hands the merge readers struct types
    * that are SUBSETS of the writer's (`struct<field1>` of a 3-field
    * struct, a 1-field array element of a 2-field one), and Spark's
    * Row→Catalyst StructConverter walks the VALUE's arity over the
    * TARGET's converter array — an unaligned wider nested row overruns
    * it with an ArrayIndexOutOfBoundsException mid-merge. Identical
    * types short-circuit to the flat coercion (the common unpruned
    * case pays one equality check, no deep walk).
    */
  def alignValue(v: Any, src: DataType, target: DataType): Any = {
    if (src == target) return coerce(v, target)
    (v, src, target) match {
      case (null, _, _) => null
      case (r: Row, s: StructType, t: StructType) =>
        val idx = s.fieldNames.zipWithIndex.toMap
        Row.fromSeq(t.fields.map { tf =>
          idx.get(tf.name)
            .map(i => alignValue(r.get(i), s.fields(i).dataType, tf.dataType))
            .orNull
        }.toIndexedSeq)
      case (seq: scala.collection.Seq[_], s: ArrayType, t: ArrayType) =>
        seq.map(alignValue(_, s.elementType, t.elementType))
      case (m: scala.collection.Map[_, _], s: MapType, t: MapType) =>
        m.map { case (k, vv) =>
          alignValue(k, s.keyType, t.keyType) -> alignValue(vv, s.valueType, t.valueType)
        }
      case (other, _, _) => coerce(other, target)
    }
  }

  /** Reusable Avro-record aligner for one (avro, target) pair: field
    * positions AND the source Spark types (a full recursive schema
    * conversion) resolve once per block, each record pays only the
    * per-field align (see [[alignValue]]).
    */
  def fromAvroAligner(
      avro: AvroSchema, target: StructType): org.apache.avro.generic.GenericRecord => Row = {
    val plan: Array[Option[(Int, AvroSchema, DataType, DataType)]] =
      target.fields.map { f =>
        Option(avro.getField(f.name)).map(af =>
          (af.pos(), af.schema(), AvroConvert.toSqlType(af.schema()), f.dataType))
      }
    rec => Row.fromSeq(plan.map {
      case Some((pos, sch, st, tt)) => alignValue(AvroConvert.toSparkValue(rec.get(pos), sch), st, tt)
      case None => null
    }.toIndexedSeq)
  }

  /** Avro record → Row in `target` field order (nested fields aligned
    * by name — see [[alignValue]]).
    */
  def fromAvro(rec: org.apache.avro.generic.GenericRecord, avro: AvroSchema, target: StructType): Row =
    fromAvroAligner(avro, target)(rec)

  /** Reusable external-Row aligner for one (from, target) pair: the
    * field mapping resolves once, each row pays only the per-field
    * align (nested fields by name — see [[alignValue]]).
    */
  def fromRowAligner(from: StructType, target: StructType): Row => Row = {
    val fromIndex = from.fieldNames.zipWithIndex.toMap
    val plan: Array[Option[(Int, DataType)]] =
      target.fields.map(f => fromIndex.get(f.name).map(i => (i, from.fields(i).dataType)))
    src => Row.fromSeq(target.fields.indices.map { j =>
      plan(j).map { case (i, st) => alignValue(src.get(i), st, target.fields(j).dataType) }
        .orNull
    })
  }

  /** External Row (with `from` schema) → Row in `target` field order. */
  def fromRow(src: Row, from: StructType, target: StructType): Row =
    fromRowAligner(from, target)(src)

  /** All data rows of a block, aligned to `target`. */
  def blockRows(b: LogBlock, target: StructType): Iterator[Row] = b.blockType match {
    case LogFormat.AvroDataBlock | LogFormat.CdcDataBlock =>
      val align = fromAvroAligner(b.dataSchema.get, target)
      b.dataRecords.iterator.map(align)
    case LogFormat.ParquetDataBlock =>
      val (schema, rows) = ParquetBlock.decode(b.rawContent)
      val align = fromRowAligner(schema, target)
      rows.iterator.map(align)
    case _ => Iterator.empty
  }
}
