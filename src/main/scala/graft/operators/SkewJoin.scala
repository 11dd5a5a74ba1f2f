package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salt-and-replicate equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of the fact rows,
  * the key-hash shuffle funnels all of them into a single task — the
  * classic straggler at 100 TB. AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin.enabled`) already splits oversized
  * partitions of a sort-merge join at runtime; this combinator covers
  * what AQE does not: shuffle-hash joins, plans where the skewed side
  * feeds further key-partitioned work, and jobs that need a layout
  * fixed at plan time instead of re-planned from runtime stats.
  *
  * Shape: the fact side gains a deterministic per-row salt in
  * `[0, salts)` (xxhash64 over the whole row — uniform, and stable so
  * reruns shuffle identically); the dim side is replicated `salts` times
  * via `explode(sequence(...))`. Joining on `(key, salt)` spreads each
  * hot key's rows across `salts` tasks. Multiplicity is provably
  * unchanged — every fact row matches exactly the one replica of its
  * dim row that carries its salt — so the result equals the unsalted
  * join (differential-tested in SkewJoinSpec, oracle-checked end-to-end
  * by `q_skew_salted_join`).
  *
  * Cost model: dim shuffle volume scales by `salts`; pick
  * `salts ~ hottest-key rows / target-partition rows`, and keep the dim
  * the smaller side. (A dim small enough to broadcast needs no salting —
  * broadcast joins don't shuffle the fact side at all.)
  */
object SkewJoin {

  private val SaltCol = "__graft_salt"

  /** Inner equi-join of `fact` and `dim` on `key`, salted `salts` ways.
    * Output columns: `key`, then the remaining fact columns, then the
    * remaining dim columns (the usual using-column join layout).
    */
  def saltedInner(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(fact.columns.contains(key) && dim.columns.contains(key),
      s"join key '$key' must exist on both sides")
    require(!fact.columns.contains(SaltCol) && !dim.columns.contains(SaltCol),
      s"inputs must not already carry a '$SaltCol' column (withColumn would clobber it)")
    val salted = fact.withColumn(
      SaltCol, pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int"))
    val replicated = dim.withColumn(
      SaltCol, explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, SaltCol), "inner").drop(SaltCol)
  }
}
