package graft.util

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The CDC union-tree bound (VERDICT r12 task 6): a long commit range
  * unions one frame per commit, and the left-deep `reduce` shape would
  * hand the analyzer an O(commits)-deep plan. BalancedUnion must keep
  * depth logarithmic and preserve union semantics.
  */
class BalancedUnionSpec extends SparkTestBase {

  test("300-leaf union: correct rows, logarithmic depth, analyzer survives") {
    // 300 single-row frames — the 200-commit backfill-replay shape with
    // margin; each row tagged so the union's completeness is checkable
    val frames = (1 to 300).map(i =>
      spark.range(1).select(lit(i).as("commit_idx"), (lit(i) * 10).as("payload")))
    val u = BalancedUnion(frames)
    // pre-optimization tree depth must be ~log2(300)=9 plus the leaf
    // plans, nowhere near the 300 a left-deep chain builds
    def depth(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
      if (p.children.isEmpty) 1 else 1 + p.children.map(depth).max
    val d = depth(u.queryExecution.logical)
    assert(d <= 24, s"balanced union depth $d, expected O(log n)")
    val rows = u.collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    assert(rows.length == 300 && rows.head == (1, 10) && rows.last == (300, 3000))
    assert(rows.map(_._1).toSet == (1 to 300).toSet)
  }

  test("column-name alignment holds (unionByName underneath)") {
    val a = spark.range(1).select(lit(1).as("x"), lit("a").as("y"))
    val b = spark.range(1).select(lit("b").as("y"), lit(2).as("x"))
    val rows = BalancedUnion(Seq(a, b)).collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted
    assert(rows.toSeq == Seq((1, "a"), (2, "b")))
  }

  test("single frame passes through") {
    val a = spark.range(3).toDF("n")
    assert(BalancedUnion(Seq(a)).collect().map(_.getLong(0)).sorted.sameElements(Array(0L, 1L, 2L)))
  }
}
