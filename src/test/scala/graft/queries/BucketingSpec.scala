package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Bucketing is the co-location technique the 100 TB design notes lean
  * on: two tables bucketed the same way on the join key join with NO
  * exchange on either side — the shuffle is paid once at write time and
  * amortized over every subsequent join. This spec proves the claim at
  * the plan level (the exact property a production pipeline relies on
  * when it lays out fact/dim tables for repeated co-located joins).
  */
class BucketingSpec extends SparkTestBase {

  /** Static (pre-AQE) plan nodes — the bucketing decision is made at
    * planning time, so the initial plan is the one under audit (the
    * PlanShapeSpec convention).
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case _ => Nil
    }
    p +: (p.children ++ nested).flatMap(allNodes)
  }

  test("same-bucketing join plans with zero shuffle exchanges") {
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_customer_bucketed")
      orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("graft_orders_bucketed")
      customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("graft_customer_bucketed")
      val joined = spark.table("graft_orders_bucketed")
        .join(spark.table("graft_customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val nodes = allNodes(joined.queryExecution.executedPlan)
      val smj = nodes.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, "bucketed equi-join must be a sort-merge join")
      // the ONLY exchange allowed is the one ABOVE the join for the
      // aggregation; neither join input may re-shuffle
      val joinSubtree = allNodes(smj.head)
      val joinShuffles = joinSubtree.collect { case e: ShuffleExchangeExec => e }
      assert(joinShuffles.isEmpty,
        s"bucketed join inputs must not shuffle, found: ${joinShuffles.map(_.nodeName)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_customer_bucketed")
    }
  }
}
