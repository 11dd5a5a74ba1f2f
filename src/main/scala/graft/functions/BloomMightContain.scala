package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(bloomBytes, xxhash64Value)` — membership probe
  * against a serialized [[org.apache.spark.util.sketch.BloomFilter]],
  * inside whole-stage codegen.
  *
  * The 100 TB use: a map-side prefilter for joins whose build side is too
  * big to broadcast as a hash relation but whose BLOOM still fits
  * comfortably (bits-per-item vs bytes-per-row — a 100M-gram benchmark
  * set is GBs as rows, ~120 MB as a 1% bloom). The probe side streams,
  * only probable hits shuffle, and the exact join downstream removes the
  * false positives — the result is bit-identical to the unfiltered join.
  * This is the same shape Spark's own `InjectRuntimeFilter` produces,
  * which does not fire here: the creation side is a DISTINCT aggregate
  * over a generator, not the selective-filter-over-scan pattern the rule
  * requires.
  *
  * Contract: the bloom must have been built with `putLong` over the SAME
  * 64-bit hash the probe passes (we use `xxhash64` on both sides — a
  * codegen'd builtin, zero per-row allocation). The bytes argument must
  * be foldable; it deserializes ONCE per task via the codegen reference
  * array, not per row.
  */
case class BloomMightContain(bloomExpr: Expression, valueExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = bloomExpr
  override def right: Expression = valueExpr
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!bloomExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains requires a foldable (literal) bloom argument")
    else if (bloomExpr.dataType != BinaryType || valueExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires (BINARY, BIGINT) arguments, got " +
          s"${bloomExpr.dataType} and ${valueExpr.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val bloom: BloomFilter = {
    val bytes = bloomExpr.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "graft_bloom_contains: bloom bytes must not be null")
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    val v = valueExpr.eval(input)
    if (v == null) null else bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    val v = valueExpr.genCode(ctx)
    ev.copy(code =
      code"""
        ${v.code}
        boolean ${ev.isNull} = ${v.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) { ${ev.value} = $bloomRef.mightContainLong(${v.value}); }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(bloomExpr = newLeft, valueExpr = newRight)
}

object BloomMightContain {
  /** Idempotent per-session SQL registration:
    * `graft_bloom_contains(bloomBytes, hash)`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_bloom_contains takes exactly 2 arguments")
        BloomMightContain(exprs.head, exprs(1))
      },
      "built-in")

  /** Build a bloom over the 64-bit `xxhash64` of `df`'s single column via
    * `stat.bloomFilter` (treeAggregate: partials merge executor-side, ONE
    * bloom copy reaches the driver; `putLong` over a long column is
    * bit-compatible with the `mightContainLong` probe — asserted by
    * BloomMightContainSpec). Returns serialized bytes ready for the
    * `graft_bloom_contains` literal argument.
    */
  def buildOverHashes(df: org.apache.spark.sql.DataFrame,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    import org.apache.spark.sql.{functions => F}
    val hashes = df.select(F.xxhash64(df.columns.map(df.col).toIndexedSeq: _*).as("h"))
    val bloom = hashes.stat.bloomFilter("h", math.max(expectedItems, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }
}
