package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Window
import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Sketch/approximation operators: value-level sanity (the estimator
  * guarantees each sketch carries) plus the plan shapes that make them
  * 100 TB-viable — combinable aggregates, no global windows over the
  * hashed stream, TakeOrdered for the retrieval top-k.
  */
class ApproxOpsSpec extends SparkTestBase {

  private def df(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  private def allNodes(d: DataFrame): Seq[SparkPlan] = {
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Nil
      }
      p +: (p.children ++ nested).flatMap(flatten)
    }
    flatten(d.queryExecution.sparkPlan)
  }

  test("HLL estimate lands within the m=256 error envelope on every source") {
    val rows = df("sketch_hll_distinct").collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val exact = r.getAs[Long]("exact_distinct")
      // 1.04/sqrt(256) = 6.5% standard error; 4 sigma leaves real slack
      // while still catching a broken register construction outright
      assert(math.abs(est / exact - 1.0) < 0.26,
        s"source ${r.getAs[String]("source")}: est $est vs exact $exact")
    }
  }

  test("HLL registers come from aggregates, not windows or distincts") {
    val q = df("sketch_hll_distinct")
    val windows = q.queryExecution.optimizedPlan.collect { case w: Window => w }
    assert(windows.isEmpty, s"sketch build must be window-free, got: $windows")
  }

  test("profile estimates stay near exact across 4 orders of cardinality magnitude") {
    val rows = df("sketch_profile").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val exact = r.getAs[Long]("exact_distinct")
      // linear counting handles the tiny-cardinality columns (2..7
      // distinct), the raw harmonic estimate the 10k-scale key columns
      assert(math.abs(est / exact - 1.0) < 0.26,
        s"${r.getAs[String]("colname")}: est $est vs exact $exact")
    }
  }

  test("CMS never underestimates and is exact where no buckets collide") {
    val rows = df("sketch_cms_counts").collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"CMS underestimated ${r.getAs[String]("tok")}")
      assert(r.getAs[Long]("exact_count") > 0L, "probe tokens must occur in the corpus")
    }
  }

  test("sampled percentiles return actual data values inside each group's range") {
    import org.apache.spark.sql.functions._
    val pct = df("q_percentile_sampled")
    val bounds = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
    val joined = pct.join(bounds, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (lo, hi) = (r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      val (p50, p95) = (r.getAs[Double]("p50_est"), r.getAs[Double]("p95_est"))
      assert(p50 >= lo && p50 <= hi && p95 >= lo && p95 <= hi && p50 <= p95,
        s"${r.getAs[String]("l_returnflag")}: p50=$p50 p95=$p95 outside [$lo,$hi]")
    }
  }

  test("BM25 top-k runs as TakeOrdered, not a global window over scored docs") {
    val q = df("text_bm25_topk")
    val takes = allNodes(q).collect { case t: TakeOrderedAndProjectExec => t }
    assert(takes.nonEmpty, "ORDER BY + LIMIT over scored docs must plan as TakeOrdered")
    val rows = q.collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Long]("score"))
    assert(scores.sameElements(scores.sorted.reverse), "ranks must follow descending score")
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 10)
  }
}
