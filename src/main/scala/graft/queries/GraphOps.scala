package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph computation done Spark-right: PageRank over the
  * bipartite customer↔supplier graph (an edge where a customer's order
  * contains a supplier's line), 10 damped iterations.
  *
  * Determinism across engines is ALL-INTEGER fixed point: ranks live as
  * BIGINT units of 1e-12, per-edge contributions are `pr DIV deg`
  * (truncating integer division), the damping step is
  * `base + (sum * 85) DIV 100` — exact, order-independent BIGINT sums,
  * zero float ops, so ten chained iterations stay bit-identical in both
  * engines (float PageRank would drift by summation order on iteration
  * one). The tiny mass truncation loses is part of the operator's
  * definition, identically in both engines.
  *
  * Scale shape (100 TB): per iteration — one broadcast-sized join of the
  * node-sized rank relation onto the (persisted) edge relation, one
  * combinable SUM shuffle by dst, and a `localCheckpoint` that cuts the
  * lineage so the plan does not grow with iteration count (the
  * dedup_groups pointer-jumping discipline; measured there, plan growth
  * per round is what kills iterative DataFrame jobs). The rank relation
  * is node-sized (orders of magnitude below edges); the edge relation is
  * built once and reused by every iteration.
  *
  * The DuckDB oracle is independently shaped: the same ten iterations
  * UNROLLED into chained CTEs (standard SQL forbids aggregation in a
  * recursive CTE term, and an unrolled chain is also a second
  * implementation rather than a transliteration).
  */
object GraphOps {

  private val Scale = 1000000000000L // 1e-12 fixed-point units
  private val Iters = 10
  private val TopK = 20

  private def sparkImpl(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("p"))
      .distinct()
    val edges = pairs
      .select(concat(lit("c"), col("c")).as("src"), concat(lit("s"), col("p")).as("dst"))
      .unionAll(
        pairs.select(concat(lit("s"), col("p")).as("src"), concat(lit("c"), col("c")).as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "src").persist()
    val n = withDeg.select("src").distinct().count()
    val prInit = Scale / n
    val baseQ = ((Scale / n) * 15) / 100
    var ranks = deg.select(col("src").as("node"), lit(prInit).as("pr"))
    try {
      for (_ <- 1 to Iters) {
        ranks = withDeg.join(ranks, col("src") === col("node"))
          .select(col("dst"), expr("pr DIV deg").as("contrib"))
          .groupBy("dst")
          .agg(sum(col("contrib")).as("csum"))
          .select(col("dst").as("node"), (lit(baseQ) + expr("(csum * 85) DIV 100")).as("pr"))
          .localCheckpoint() // eager: cuts lineage, materializes the iteration
      }
      val top = ranks.orderBy(col("pr").desc, col("node")).limit(TopK)
      top.select(
        row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("pr").desc, col("node")))
          .as("rank"),
        col("node"), col("pr"))
        .orderBy("rank")
    } finally withDeg.unpersist(blocking = false)
  }

  private def duckSql: String = {
    val iters = (1 to Iters).map { k =>
      s"""pr$k AS (
         |  SELECT e.dst AS node,
         |    b.b + (CAST(SUM(p.pr // d.deg) AS BIGINT) * 85) // 100 AS pr
         |  FROM edges e
         |  JOIN pr${k - 1} p ON p.node = e.src
         |  JOIN deg d ON d.src = e.src
         |  CROSS JOIN base b
         |  GROUP BY e.dst, b.b)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS p
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |edges AS (
       |  SELECT 'c' || CAST(c AS VARCHAR) AS src, 's' || CAST(p AS VARCHAR) AS dst FROM pairs
       |  UNION ALL
       |  SELECT 's' || CAST(p AS VARCHAR), 'c' || CAST(c AS VARCHAR) FROM pairs),
       |deg AS (SELECT src, CAST(COUNT(1) AS BIGINT) AS deg FROM edges GROUP BY src),
       |nn AS (SELECT CAST(COUNT(1) AS BIGINT) AS n FROM deg),
       |base AS (SELECT (($Scale // n) * 15) // 100 AS b FROM nn),
       |pr0 AS (SELECT src AS node, $Scale // n AS pr FROM deg CROSS JOIN nn),
       |$iters,
       |top AS (SELECT node, pr FROM pr$Iters ORDER BY pr DESC, node LIMIT $TopK)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY pr DESC, node) AS INT) AS rank, node, pr
       |FROM top
       |ORDER BY rank""".stripMargin
  }

  def queries: Map[String, QueryDef] = Map(
    "graph_pagerank" -> QueryDef(sparkImpl _, duckSql)
  )
}
