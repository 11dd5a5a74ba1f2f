package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-gram set of a string as one per-row call —
  * replaces the `array_distinct(transform(sequence(1, len-n+1), i ->
  * substring(text, i, n)))` pipeline, which materializes three boxed
  * arrays and makes one interpreted closure call per position. Semantics
  * match that pipeline exactly (including the `greatest(…, 1)` lower
  * bound: strings shorter than n yield the whole string), so the DuckDB
  * oracle keeps the portable list_transform formulation.
  */
case class ShingleSet(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires (STRING, INT), got ${left.dataType}, ${right.dataType}")

  override def foldable: Boolean = left.foldable && right.foldable

  override protected def nullSafeEval(textAny: Any, nAny: Any): Any = {
    val text = textAny.asInstanceOf[UTF8String].toString
    val n = nAny.asInstanceOf[Int]
    // SQL parity for degenerate n: substring(text, i, n<=0) is '' in both
    // engines, so the distinct set is [''] (the old code threw on n <= -1)
    if (n <= 0)
      return new GenericArrayData(Array[Any](UTF8String.fromString("")))
    // code-point slicing, NOT Java UTF-16 units: Spark's substring/length
    // and DuckDB's count characters (one per code point), so a surrogate
    // pair must be one shingle position or the oracle equivalence breaks
    // on non-BMP input
    val cps = text.codePoints().toArray
    val len = cps.length
    val count = math.max(len - n + 1, 1)
    val seen = new java.util.LinkedHashSet[String](count * 2)
    var i = 0
    while (i < count) {
      seen.add(new String(cps, i, math.min(n, len - i)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleSet {
  /** Idempotent per-session SQL registration: `graft_shingles(text, n)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles",
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_shingles takes exactly 2 arguments")
        ShingleSet(exprs.head, exprs(1))
      },
      "built-in")
}
