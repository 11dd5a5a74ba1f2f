package graft.table

import graft.SparkTestBase
import graft.fixtures.HudiFixtureBuilder
import org.apache.spark.sql.functions._

/** Change classification semantics over the log-only fixture: the
  * base-less group's birth commit classifies as inserts, the later log
  * updates as updates, and deleted-only keys are invisible (documented
  * incremental limitation).
  */
class ChangeClassifierSpec extends SparkTestBase {

  private lazy val table = {
    HudiFixtureBuilder.ensure(spark, sfDir)
    HudiTable(spark, HudiFixtureBuilder.morLogOnlyPath(sfDir))
  }

  test("the birth commit of a fresh file group classifies as inserts") {
    val rows = ChangeClassifier.changes(table, HudiFixtureBuilder.T1, HudiFixtureBuilder.T2)
      .select("o_orderkey", "change_type").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1) == "insert"))
    assert(rows.forall(_.getLong(0) % 3 == 1))
  }

  test("later log updates classify as updates; deleted-only keys are invisible") {
    val rows = ChangeClassifier.changes(table, HudiFixtureBuilder.T2, HudiFixtureBuilder.T3)
      .select("o_orderkey", "change_type", "o_orderstatus").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(1) == "update" && r.getString(2) == "U"))
    // every surfaced key was updated at T3; deleted-only keys (% 11 = 0
    // without the % 5 = 0 update) never appear
    assert(rows.forall(_.getLong(0) % 5 == 0))
  }

  test("the snapshot key relation is column-pruned, not collected") {
    val df = ChangeClassifier.changes(table, HudiFixtureBuilder.T1, HudiFixtureBuilder.T2)
    // the prev-snapshot branch must project only the record key (+ the
    // existence marker): a full-width snapshot in the join would drag
    // every column of a 100 TB table through the shuffle
    val wide = df.queryExecution.optimizedPlan.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project
          if p.output.map(_.name).contains("__existed") => p.output.map(_.name)
    }
    assert(wide.nonEmpty && wide.forall(_.toSet == Set("o_orderkey", "__existed")),
      s"prev-snapshot branch must carry only (key, marker), got: $wide")
  }
}
