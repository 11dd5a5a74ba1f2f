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
  * Covers the flat + common-logical-type surface Hudi writes into log
  * blocks; nested log-block schemas raise, matching what the fixtures
  * exercise.
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
    case _ =>
      throw new UnsupportedOperationException(
        "nested schemas in parquet log blocks are not supported")
  }

  private def toRow(g: Group, mt: GroupType): Row = {
    val n = mt.getFieldCount
    val vals = new Array[Any](n)
    var i = 0
    while (i < n) {
      vals(i) =
        if (g.getFieldRepetitionCount(i) == 0) null
        else value(g, i, mt.getType(i).asPrimitiveType())
      i += 1
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  private def value(g: Group, i: Int, p: PrimitiveType): Any = {
    val ann = p.getLogicalTypeAnnotation
    p.getPrimitiveTypeName match {
      case BOOLEAN => g.getBoolean(i, 0)
      case INT32 =>
        ann match {
          case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
            java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(g.getInteger(i, 0).toLong))
          case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            java.math.BigDecimal.valueOf(g.getInteger(i, 0).toLong, d.getScale)
          case _ => g.getInteger(i, 0)
        }
      case INT64 =>
        ann match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            val micros = ts.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MILLIS => g.getLong(i, 0) * 1000L
              case LogicalTypeAnnotation.TimeUnit.MICROS => g.getLong(i, 0)
              case LogicalTypeAnnotation.TimeUnit.NANOS => g.getLong(i, 0) / 1000L
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
            java.math.BigDecimal.valueOf(g.getLong(i, 0), d.getScale)
          case _ => g.getLong(i, 0)
        }
      case FLOAT => g.getFloat(i, 0)
      case DOUBLE => g.getDouble(i, 0)
      case BINARY | FIXED_LEN_BYTE_ARRAY =>
        ann match {
          case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation => g.getString(i, 0)
          case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            new java.math.BigDecimal(
              new java.math.BigInteger(g.getBinary(i, 0).getBytes), d.getScale)
          case _ => g.getBinary(i, 0).getBytes
        }
      case other =>
        throw new UnsupportedOperationException(s"parquet log block type $other")
    }
  }
}
