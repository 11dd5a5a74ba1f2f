package graft.log

import org.apache.avro.{LogicalTypes, Schema => AvroSchema}
import org.apache.avro.generic.{GenericFixed, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.math.BigInteger
import java.nio.ByteBuffer
import java.sql.{Date, Timestamp}
import scala.jdk.CollectionConverters._

/** Avro → Spark SQL conversion for log-block payloads, covering the type
  * matrix of the reference's avro_to_arrow (crates/core/src/avro_to_arrow/
  * schema.rs:63-150) mapped onto Spark types per SURVEY.md §1.2. spark-avro
  * is not on the classpath in this environment, so this is a small
  * self-contained converter (schemas + GenericData values only).
  */
object AvroConvert {

  /** Avro schema → Spark DataType. */
  def toSqlType(schema: AvroSchema): DataType = schema.getType match {
    case AvroSchema.Type.BOOLEAN => BooleanType
    case AvroSchema.Type.INT =>
      schema.getLogicalType match {
        case _: LogicalTypes.Date => DateType
        case _ => IntegerType
      }
    case AvroSchema.Type.LONG =>
      schema.getLogicalType match {
        case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros => TimestampType
        case _: LogicalTypes.LocalTimestampMillis | _: LogicalTypes.LocalTimestampMicros =>
          TimestampNTZType
        case _ => LongType
      }
    case AvroSchema.Type.FLOAT => FloatType
    case AvroSchema.Type.DOUBLE => DoubleType
    case AvroSchema.Type.STRING | AvroSchema.Type.ENUM => StringType
    case AvroSchema.Type.BYTES | AvroSchema.Type.FIXED =>
      schema.getLogicalType match {
        case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
    case AvroSchema.Type.ARRAY =>
      val (elem, nullable) = unwrapNullable(schema.getElementType)
      ArrayType(toSqlType(elem), containsNull = nullable)
    case AvroSchema.Type.MAP =>
      val (v, nullable) = unwrapNullable(schema.getValueType)
      MapType(StringType, toSqlType(v), valueContainsNull = nullable)
    case AvroSchema.Type.RECORD =>
      StructType(schema.getFields.asScala.map { f =>
        val (t, nullable) = unwrapNullable(f.schema())
        StructField(f.name(), toSqlType(t), nullable)
      }.toArray)
    case AvroSchema.Type.UNION =>
      val (t, _) = unwrapNullable(schema)
      toSqlType(t)
    case AvroSchema.Type.NULL => NullType
    case other => throw new IllegalArgumentException(s"Unsupported Avro type: $other")
  }

  /** Unwrap `[null, T]`-style unions → (T, nullable). */
  def unwrapNullable(schema: AvroSchema): (AvroSchema, Boolean) =
    if (schema.getType == AvroSchema.Type.UNION) {
      val branches = schema.getTypes.asScala.filter(_.getType != AvroSchema.Type.NULL)
      val nullable = branches.size < schema.getTypes.size()
      if (branches.size == 1) (branches.head, nullable)
      else throw new IllegalArgumentException(s"Unsupported multi-type union: $schema")
    } else (schema, false)

  def toStructType(schema: AvroSchema): StructType =
    toSqlType(schema).asInstanceOf[StructType]

  /** Convert one decoded Avro value to the Spark external representation
    * (Row / Seq / Map / java.sql types), driven by the writer schema.
    */
  def toSparkValue(value: Any, schema: AvroSchema): Any = {
    if (value == null) return null
    schema.getType match {
      case AvroSchema.Type.UNION =>
        val (t, _) = unwrapNullable(schema)
        toSparkValue(value, t)
      case AvroSchema.Type.BOOLEAN | AvroSchema.Type.FLOAT | AvroSchema.Type.DOUBLE => value
      case AvroSchema.Type.INT =>
        schema.getLogicalType match {
          case _: LogicalTypes.Date => Date.valueOf(java.time.LocalDate.ofEpochDay(value.asInstanceOf[Int].toLong))
          case _ => value
        }
      case AvroSchema.Type.LONG =>
        schema.getLogicalType match {
          case _: LogicalTypes.TimestampMillis =>
            new Timestamp(value.asInstanceOf[Long])
          case _: LogicalTypes.TimestampMicros =>
            val micros = value.asInstanceOf[Long]
            val ts = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
            ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
            ts
          case _: LogicalTypes.LocalTimestampMillis =>
            java.time.LocalDateTime.ofEpochSecond(
              Math.floorDiv(value.asInstanceOf[Long], 1000L),
              Math.floorMod(value.asInstanceOf[Long], 1000L).toInt * 1000000,
              java.time.ZoneOffset.UTC)
          case _: LogicalTypes.LocalTimestampMicros =>
            java.time.LocalDateTime.ofEpochSecond(
              Math.floorDiv(value.asInstanceOf[Long], 1000000L),
              Math.floorMod(value.asInstanceOf[Long], 1000000L).toInt * 1000,
              java.time.ZoneOffset.UTC)
          case _ => value
        }
      case AvroSchema.Type.STRING | AvroSchema.Type.ENUM => value.toString
      case AvroSchema.Type.BYTES =>
        val bytes = value match {
          case bb: ByteBuffer =>
            val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
          case arr: Array[Byte] => arr
        }
        schema.getLogicalType match {
          case d: LogicalTypes.Decimal => new java.math.BigDecimal(new BigInteger(bytes), d.getScale)
          case _ => bytes
        }
      case AvroSchema.Type.FIXED =>
        val bytes = value.asInstanceOf[GenericFixed].bytes()
        schema.getLogicalType match {
          case d: LogicalTypes.Decimal => new java.math.BigDecimal(new BigInteger(bytes), d.getScale)
          case _ => bytes
        }
      case AvroSchema.Type.ARRAY =>
        val elem = schema.getElementType
        value.asInstanceOf[java.util.Collection[Any]].asScala.map(toSparkValue(_, elem)).toSeq
      case AvroSchema.Type.MAP =>
        val vs = schema.getValueType
        value.asInstanceOf[java.util.Map[Any, Any]].asScala.map { case (k, v) =>
          (k match { case u: Utf8 => u.toString; case s => s.toString }) -> toSparkValue(v, vs)
        }.toMap
      case AvroSchema.Type.RECORD =>
        toRow(value.asInstanceOf[GenericRecord], schema)
      case other => throw new IllegalArgumentException(s"Unsupported Avro value type: $other")
    }
  }

  def toRow(rec: GenericRecord, schema: AvroSchema): Row = {
    val fields = schema.getFields
    val vals = new Array[Any](fields.size())
    var i = 0
    while (i < fields.size()) {
      vals(i) = toSparkValue(rec.get(i), fields.get(i).schema())
      i += 1
    }
    Row.fromSeq(vals.toIndexedSeq)
  }
}
