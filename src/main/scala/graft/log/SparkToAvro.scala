package graft.log

import org.apache.avro.{Schema => AvroSchema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** Spark StructType → Avro schema + Row → GenericRecord, for writing Avro
  * log blocks (fixture/test support; the flat-type subset the fixtures
  * use). Inverse of [[AvroConvert]].
  */
object SparkToAvro {

  def toAvroSchema(schema: StructType, recordName: String): AvroSchema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case StringType => AvroSchema.create(AvroSchema.Type.STRING)
        case IntegerType | ShortType | ByteType => AvroSchema.create(AvroSchema.Type.INT)
        case LongType => AvroSchema.create(AvroSchema.Type.LONG)
        case FloatType => AvroSchema.create(AvroSchema.Type.FLOAT)
        case DoubleType => AvroSchema.create(AvroSchema.Type.DOUBLE)
        case BooleanType => AvroSchema.create(AvroSchema.Type.BOOLEAN)
        case TimestampType =>
          org.apache.avro.LogicalTypes.timestampMicros()
            .addToSchema(AvroSchema.create(AvroSchema.Type.LONG))
        case TimestampNTZType =>
          org.apache.avro.LogicalTypes.localTimestampMicros()
            .addToSchema(AvroSchema.create(AvroSchema.Type.LONG))
        case DateType =>
          org.apache.avro.LogicalTypes.date()
            .addToSchema(AvroSchema.create(AvroSchema.Type.INT))
        case dt: DecimalType =>
          org.apache.avro.LogicalTypes.decimal(dt.precision, dt.scale)
            .addToSchema(AvroSchema.create(AvroSchema.Type.BYTES))
        case BinaryType => AvroSchema.create(AvroSchema.Type.BYTES)
        case ArrayType(StringType, _) =>
          AvroSchema.createArray(AvroSchema.create(AvroSchema.Type.STRING))
        case ArrayType(FloatType, _) =>
          AvroSchema.createArray(AvroSchema.create(AvroSchema.Type.FLOAT))
        case ArrayType(DoubleType, _) =>
          AvroSchema.createArray(AvroSchema.create(AvroSchema.Type.DOUBLE))
        case ArrayType(IntegerType, _) =>
          AvroSchema.createArray(AvroSchema.create(AvroSchema.Type.INT))
        case ArrayType(LongType, _) =>
          AvroSchema.createArray(AvroSchema.create(AvroSchema.Type.LONG))
        case other => throw new IllegalArgumentException(s"Fixture writer: unsupported type $other")
      }
      new AvroSchema.Field(f.name,
        AvroSchema.createUnion(AvroSchema.create(AvroSchema.Type.NULL), base),
        null, AvroSchema.Field.NULL_DEFAULT_VALUE)
    }
    AvroSchema.createRecord(recordName, null, "graft.fixtures", false, fields.toList.asJava)
  }

  /** Upstream's CDC record schema for supplemental logging mode
    * `data_before_after` (HoodieCDCUtils.schemaBySupplementalLoggingMode):
    * `op` and `ts_ms` strings plus nullable `before`/`after` images of
    * the DATA record — both unions reference the SAME named record, which
    * Avro renders as a name reference on the second occurrence.
    */
  def cdcAvroSchema(dataSchema: StructType, recordName: String): AvroSchema = {
    val dataRec = toAvroSchema(dataSchema, recordName)
    val str = AvroSchema.create(AvroSchema.Type.STRING)
    val nullRec = () =>
      AvroSchema.createUnion(AvroSchema.create(AvroSchema.Type.NULL), dataRec)
    val fields = List(
      new AvroSchema.Field("op", str, null, null.asInstanceOf[Object]),
      new AvroSchema.Field("ts_ms", str, null, null.asInstanceOf[Object]),
      new AvroSchema.Field("before", nullRec(), null, AvroSchema.Field.NULL_DEFAULT_VALUE),
      new AvroSchema.Field("after", nullRec(), null, AvroSchema.Field.NULL_DEFAULT_VALUE))
    AvroSchema.createRecord(s"${recordName}_cdc", null, "graft.fixtures", false, fields.asJava)
  }

  /** Upstream's CDC record schema for supplemental logging mode
    * `data_before` (HoodieCDCUtils): op + record_key + the exact BEFORE
    * image only — half the block bytes, the after side restricted-read
    * at serve time.
    */
  def cdcAvroSchemaDataBefore(dataSchema: StructType, recordName: String): AvroSchema = {
    val dataRec = toAvroSchema(dataSchema, recordName)
    val str = AvroSchema.create(AvroSchema.Type.STRING)
    val fields = List(
      new AvroSchema.Field("op", str, null, null.asInstanceOf[Object]),
      new AvroSchema.Field("record_key", str, null, null.asInstanceOf[Object]),
      new AvroSchema.Field("before",
        AvroSchema.createUnion(AvroSchema.create(AvroSchema.Type.NULL), dataRec),
        null, AvroSchema.Field.NULL_DEFAULT_VALUE))
    AvroSchema.createRecord(s"${recordName}_cdc_before", null, "graft.fixtures", false,
      fields.asJava)
  }

  /** Mode `op_key_only`: op + record_key per change — enough to narrow
    * an inference join to the changed keys and to know ops exactly.
    */
  def cdcAvroSchemaOpKeyOnly(recordName: String): AvroSchema = {
    val str = AvroSchema.create(AvroSchema.Type.STRING)
    val fields = List(
      new AvroSchema.Field("op", str, null, null.asInstanceOf[Object]),
      new AvroSchema.Field("record_key", str, null, null.asInstanceOf[Object]))
    AvroSchema.createRecord(s"${recordName}_cdc_key", null, "graft.fixtures", false,
      fields.asJava)
  }

  /** One record for [[cdcAvroSchemaDataBefore]] / [[cdcAvroSchemaOpKeyOnly]]. */
  def cdcPartialRecord(
      cdcAvro: AvroSchema,
      dataSchema: StructType,
      op: String,
      recordKey: String,
      before: Option[Row]): GenericRecord = {
    val rec = new GenericData.Record(cdcAvro)
    rec.put("op", op)
    rec.put("record_key", recordKey)
    if (cdcAvro.getField("before") != null) {
      val dataRec = cdcAvro.getField("before").schema().getTypes.get(1)
      rec.put("before", before.map(toRecord(_, dataSchema, dataRec)).orNull)
    }
    rec
  }

  /** One CDC image record for [[cdcAvroSchema]]'s shape. */
  def cdcRecord(
      cdcAvro: AvroSchema,
      dataSchema: StructType,
      op: String,
      tsMs: String,
      before: Option[Row],
      after: Option[Row]): GenericRecord = {
    val dataRec = cdcAvro.getField("before").schema().getTypes.get(1)
    val rec = new GenericData.Record(cdcAvro)
    rec.put("op", op)
    rec.put("ts_ms", tsMs)
    rec.put("before", before.map(toRecord(_, dataSchema, dataRec)).orNull)
    rec.put("after", after.map(toRecord(_, dataSchema, dataRec)).orNull)
    rec
  }

  def toRecord(row: Row, schema: StructType, avro: AvroSchema): GenericRecord = {
    val rec = new GenericData.Record(avro)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val v = row.get(i) match {
        case null => null
        case ts: Timestamp => ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
        case ldt: java.time.LocalDateTime =>
          val i = ldt.toInstant(java.time.ZoneOffset.UTC)
          i.getEpochSecond * 1000000L + i.getNano / 1000L
        case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
        case ld: java.time.LocalDate => ld.toEpochDay.toInt
        case s: Short => s.toInt
        case b: Byte => b.toInt
        case bd: java.math.BigDecimal =>
          // unscaled two's-complement bytes at the DECLARED scale — the
          // avro decimal(p,s) wire form AvroConvert reads back
          val scale = f.dataType.asInstanceOf[DecimalType].scale
          java.nio.ByteBuffer.wrap(bd.setScale(scale).unscaledValue.toByteArray)
        case other => other
      }
      rec.put(f.name, v)
    }
    rec
  }
}
