package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The exact-aggregation discipline (README "Float determinism"): sum a
  * (≤4-dp, <1e14) double column as DECIMAL(18,4) — exact and
  * order-independent, so partial-aggregation order cannot change the
  * result — and cast back to DOUBLE only at the end. ONE definition of
  * the precision/scale contract; the oracle SQL mirrors it as
  * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
  */
object ExactAgg {
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)
}
