package graft.log

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType, Type}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Decoder for PARQUET log data blocks (block type 5): the content is a
  * complete parquet file's bytes (crates/core/src/file_group/log_file/
  * content.rs:135-146). Decoded via parquet-hadoop's example Group reader
  * over a spilled temp file (parquet needs a seekable footer; the block is
  * already fully in memory and log blocks are small by construction).
  *
  * Covers the full surface Hudi's writers put into log blocks, including
  * nested types: structs, LIST/MAP-annotated groups (both the 3-level
  * `list/element` layout and parquet-avro's legacy 2-level repeated
  * layout), and decimals in every physical encoding — the sample-table
  * fixtures' MOR-parquet variants carry all of these in their log blocks.
  */
object ParquetBlock {

  def decode(content: Array[Byte]): (StructType, Vector[Row]) = {
    val tmp = Files.createTempFile("graft-log-parquet", ".parquet")
    try {
      Files.write(tmp, content)
      val reader = ParquetReader
        .builder(new GroupReadSupport(), new HPath(tmp.toUri.toString))
        .withConf(new Configuration(false))
        .build()
      try {
        val rows = Vector.newBuilder[Row]
        var schema: StructType = null
        var g = reader.read()
        while (g != null) {
          if (schema == null) schema = toStructType(g.getType)
          rows += toRow(g, g.getType)
          g = reader.read()
        }
        (if (schema != null) schema else StructType(Nil), rows.result())
      } finally reader.close()
    } finally Files.deleteIfExists(tmp)
  }

  private def toStructType(mt: GroupType): StructType =
    StructType(mt.getFields.toArray(Array.empty[Type]).map { f =>
      StructField(f.getName, sqlType(f), nullable = !f.isRepetition(Type.Repetition.REQUIRED))
    })

  private def sqlType(t: Type): DataType = t match {
    case p: PrimitiveType =>
      val ann = p.getLogicalTypeAnnotation
      p.getPrimitiveTypeName match {
        case BOOLEAN => BooleanType
        case INT32 =>
          ann match {
            case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => DateType
            case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => DecimalType(d.getPrecision, d.getScale)
            case _ => IntegerType
          }
        case INT64 =>
          ann match {
            case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              if (ts.isAdjustedToUTC) TimestampType else TimestampNTZType
            case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => DecimalType(d.getPrecision, d.getScale)
            case _ => LongType
          }
        case FLOAT => FloatType
        case DOUBLE => DoubleType
        case BINARY | FIXED_LEN_BYTE_ARRAY =>
          ann match {
            case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation => StringType
            case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => DecimalType(d.getPrecision, d.getScale)
            case _ => BinaryType
          }
        case other =>
          throw new UnsupportedOperationException(s"parquet log block type $other")
      }
    case gt: GroupType =>
      gt.getLogicalTypeAnnotation match {
        case _: LogicalTypeAnnotation.ListLogicalTypeAnnotation =>
          ArrayType(sqlType(listElement(gt.getType(0), gt.getName)), containsNull = true)
        case _: LogicalTypeAnnotation.MapLogicalTypeAnnotation =>
          val kv = gt.getType(0).asGroupType()
          MapType(sqlType(kv.getType(0)), sqlType(kv.getType(1)), valueContainsNull = true)
        case _ => toStructType(gt)
      }
  }

  /** LIST element resolution per parquet-format's backward-compat rules
    * (the same predicate as Spark's ParquetSchemaConverter.isElementType):
    * the repeated type IS the element when it is (1) primitive, (2) a
    * multi-field group, or (3) a single-field group named `array` or
    * `<listName>_tuple` (parquet-avro/thrift legacy 2-level layouts);
    * OTHERWISE (rule 4) the repeated group is a wrapper and its single
    * field is the element — regardless of that field's name (the standard
    * 3-level `list/element`, but also Hive's `bag/array_element`).
    */
  private def listElement(repeated: Type, listName: String): Type = repeated match {
    case rg: GroupType if rg.getFieldCount == 1 &&
        rg.getName != "array" && rg.getName != s"${listName}_tuple" =>
      rg.getType(0)
    case other => other
  }

  private def toRow(g: Group, mt: GroupType): Row = {
    val n = mt.getFieldCount
    val vals = new Array[Any](n)
    var i = 0
    while (i < n) {
      vals(i) =
        if (g.getFieldRepetitionCount(i) == 0) null
        else fieldValue(g, i, mt.getType(i))
      i += 1
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  /** Value of occurrence 0 of field `i` (presence already checked). */
  private def fieldValue(g: Group, i: Int, t: Type): Any = nestedValue(g, i, 0, t)

  /** Value of occurrence `j` of field `i`, annotation-aware at EVERY
    * nesting level: list elements and map keys/values recurse back
    * through the same LIST/MAP handling, so doubly-nested types
    * (list<list<…>>, list<map<…>>, map values that are lists/maps)
    * decode to the shape `sqlType` declares instead of degrading to a
    * plain struct Row one level down.
    */
  private def nestedValue(g: Group, i: Int, j: Int, t: Type): Any = t match {
    case p: PrimitiveType => value(g, i, j, p)
    case gt: GroupType =>
      gt.getLogicalTypeAnnotation match {
        case _: LogicalTypeAnnotation.ListLogicalTypeAnnotation =>
          val outer = g.getGroup(i, j)
          val repeated = gt.getType(0)
          val elem = listElement(repeated, gt.getName)
          val n = outer.getFieldRepetitionCount(0)
          val threeLevel = !(repeated eq elem)
          (0 until n).map { k =>
            if (threeLevel) {
              val wrapper = outer.getGroup(0, k)
              if (wrapper.getFieldRepetitionCount(0) == 0) null
              else nestedValue(wrapper, 0, 0, elem)
            } else nestedValue(outer, 0, k, elem)
          }
        case _: LogicalTypeAnnotation.MapLogicalTypeAnnotation =>
          val outer = g.getGroup(i, j)
          val kv = gt.getType(0).asGroupType()
          val n = outer.getFieldRepetitionCount(0)
          (0 until n).map { k =>
            val e = outer.getGroup(0, k)
            val key = nestedValue(e, 0, 0, kv.getType(0))
            val v = if (e.getFieldRepetitionCount(1) == 0) null
                    else nestedValue(e, 1, 0, kv.getType(1))
            key -> v
          }.toMap
        case _ => toRow(g.getGroup(i, j), gt)
      }
  }

  private def value(g: Group, i: Int, j: Int, p: PrimitiveType): Any = {
    val ann = p.getLogicalTypeAnnotation
    p.getPrimitiveTypeName match {
      case BOOLEAN => g.getBoolean(i, j)
      case INT32 =>
        ann match {
          case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
            java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(g.getInteger(i, j).toLong))
          case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            java.math.BigDecimal.valueOf(g.getInteger(i, j).toLong, d.getScale)
          case _ => g.getInteger(i, j)
        }
      case INT64 =>
        ann match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            val micros = ts.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MILLIS => g.getLong(i, j) * 1000L
              case LogicalTypeAnnotation.TimeUnit.MICROS => g.getLong(i, j)
              case LogicalTypeAnnotation.TimeUnit.NANOS => g.getLong(i, j) / 1000L
            }
            if (ts.isAdjustedToUTC) {
              val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
              t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
              t
            } else
              java.time.LocalDateTime.ofEpochSecond(
                Math.floorDiv(micros, 1000000L),
                Math.floorMod(micros, 1000000L).toInt * 1000,
                java.time.ZoneOffset.UTC)
          case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            java.math.BigDecimal.valueOf(g.getLong(i, j), d.getScale)
          case _ => g.getLong(i, j)
        }
      case FLOAT => g.getFloat(i, j)
      case DOUBLE => g.getDouble(i, j)
      case BINARY | FIXED_LEN_BYTE_ARRAY =>
        ann match {
          case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation => g.getString(i, j)
          case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            new java.math.BigDecimal(
              new java.math.BigInteger(g.getBinary(i, j).getBytes), d.getScale)
          case _ => g.getBinary(i, j).getBytes
        }
      case other =>
        throw new UnsupportedOperationException(s"parquet log block type $other")
    }
  }
}
