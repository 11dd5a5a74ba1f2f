package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** PageRank invariants plus the property that makes ten DataFrame
  * iterations viable at scale: localCheckpoint cuts lineage, so the
  * final plan must NOT contain the 10-iteration join chain.
  */
class GraphOpsSpec extends SparkTestBase {

  private lazy val result = SparkEntry.queries("graph_pagerank")(spark, sfDir)

  test("ranks are positive, strictly ordered, and nodes distinct") {
    val rows = result.collect()
    assert(rows.length == 20)
    val prs = rows.map(_.getAs[Long]("pr"))
    assert(prs.forall(_ > 0))
    assert(prs.sameElements(prs.sorted.reverse))
    assert(rows.map(_.getAs[String]("node")).distinct.length == 20)
    // the bipartite graph's small side (100 suppliers vs ~1.5k customers)
    // concentrates degree, so suppliers must dominate the top ranks
    assert(rows.take(5).forall(_.getAs[String]("node").startsWith("s")))
  }

  test("the shuffle-hash regime (node set too big to broadcast) is bit-identical") {
    val key = "graft.pagerank.broadcast.max.bytes"
    val viaBroadcast = result.collect()
    sys.props(key) = "0" // force the co-partitioned shuffle-hash path
    try {
      val viaShuffle = GraphOps.sparkImpl(spark, sfDir).collect()
      assert(viaShuffle.toSeq == viaBroadcast.toSeq)
    } finally {
      sys.props.remove(key)
      // the forced-gate prep must not stay pinned for the shared session
      GraphOps.dropPrep(spark, "pagerank_prep:0")
    }
  }

  test("checkpointing cut the iteration lineage out of the final plan") {
    val joins = result.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    // without the per-iteration localCheckpoint the plan would carry ten
    // chained (edges ⋈ ranks) joins; after the cut (and the final-
    // generation free, which collects the TopK-bounded rows so the last
    // checkpoint can be released too) only a self-contained
    // LocalRelation of the top-k ranks remains
    assert(joins.isEmpty,
      s"final plan must read the materialized ranks, found ${joins.length} joins")
    val locals = result.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(locals.nonEmpty, "expected a self-contained LocalRelation of the top-k ranks")
  }
}
