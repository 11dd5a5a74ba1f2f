package graft.operators

import graft.SparkTestBase
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** SkewJoin is correct iff it equals the unsalted join exactly — the
  * differential IS the contract (plus the oracle entry
  * `q_skew_salted_join` end-to-end). The plan test pins the mechanism:
  * a dim-side explode and a join carrying the salt column.
  */
class SkewJoinSpec extends SparkTestBase {

  private lazy val ev = Tables.events(spark, sfDir)
  private lazy val dim = ev.groupBy("user_id").agg(
    min(col("ts")).as("first_ts"), count(lit(1)).as("n"))

  test("salted inner join equals the plain inner join row-for-row") {
    val plain = ev.join(dim, Seq("user_id"), "inner")
    val salted = SkewJoin.saltedInner(ev, dim, "user_id", salts = 8)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salts = 1 degenerates to the plain join") {
    val plain = ev.join(dim, Seq("user_id"), "inner")
    val salted = SkewJoin.saltedInner(ev, dim, "user_id", salts = 1)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("the join key includes the salt and the dim side is exploded") {
    val salted = SkewJoin.saltedInner(ev, dim, "user_id", salts = 8)
    val plan = salted.queryExecution.optimizedPlan
    val generates = plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(generates.nonEmpty, "dim replication must be an explode, not a cross join")
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.exists(_.condition.exists(_.references.exists(_.name.contains("salt")))),
      "join condition must carry the salt column")
  }

  test("every salt value actually occurs (the hot key really spreads)") {
    val salts = 8
    val salted = ev.withColumn(
      "s", pmod(xxhash64(ev.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val distinctSalts = salted.select("s").distinct().count()
    assert(distinctSalts == salts, s"expected all $salts salt values, got $distinctSalts")
  }
}
