package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

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

  /** Broadcast gate for the per-iteration (edges ⋈ ranks) join. The rank
    * relation is node-sized; after `localCheckpoint` its stats are gone,
    * so WITHOUT the explicit hint Spark shuffle-joins the full edge
    * relation every iteration (measured: 13s vs 1s at sf0.1). Below the
    * gate the node relation broadcasts; above it (a graph whose node set
    * alone beats the broadcast limit) the edge relation is hash-
    * partitioned by src ONCE and each iteration shuffles only the
    * node-sized rank relation into a shuffle-hash join — no edge
    * re-shuffle, no sort. Overridable for the regime-differential test.
    */
  private def broadcastMaxBytes: Long =
    sys.props.get("graft.pagerank.broadcast.max.bytes").map(_.toLong).getOrElse(64L << 20)
  private val RankRowBytes = 48L // BIGINT node id + long rank + row overhead
  private val EdgeRowBytes = 64L // src, dst, deg BIGINTs + row overhead
  private val TargetPartitionBytes = 32L << 20

  /** Smallest per-partition edge slice that justifies occupying a core:
    * the parallelism floor on the iteration relation's partitioning stops
    * at `edgeBytes / minPartitionBytes` partitions (sys-prop override for
    * the dev probe; default measured at sf0.1 — see OPTIMIZATION_r16.md).
    */
  private def minPartitionBytes: Long =
    sys.props.get("graft.pagerank.min.partition.bytes").map(_.toLong).getOrElse(8L << 20)

  /** Session-shared graph prep (the ANN/minhash prep contract): the
    * (edges ⋈ deg) relation and node count build ONCE per (session, dir,
    * regime) and stay persisted — ten iterations plus repeat invocations
    * all read the same cached relation instead of re-deriving the pair
    * graph from the base tables. Nodes are BIGINT ids inside the loop
    * (customer 2k, supplier 2k+1): integer join/agg keys shuffle a
    * fraction of the string bytes, and the display name is restored on
    * the node-sized relation at the very end.
    */
  private case class Prep(dir: String, withDeg: DataFrame, nodes: DataFrame, n: Long) {
    def unpersistAll(): Unit = {
      withDeg.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
    }
  }

  /** Remove and unpersist cached preps (exposed for the regime test's
    * cleanup — a forced-gate prep must not stay pinned for the session).
    */
  private[queries] def dropPrep(s: SparkSession, key: String): Unit = {
    val reg = SessionRegistry.of(s)
    reg.synchronized {
      reg.remove(key).collect { case p: Prep => p }.foreach(_.unpersistAll())
    }
  }

  /** Unpersist and forget every graph prep — pagerank (all regime keys)
    * and the triangles edge cache (bench group-boundary hygiene).
    */
  private[graft] def dropCaches(s: SparkSession): Unit = {
    val reg = SessionRegistry.of(s)
    reg.synchronized {
      reg.keySet.filter(_.startsWith("pagerank_prep:")).foreach(k =>
        reg.remove(k).collect { case p: Prep => p }.foreach(_.unpersistAll()))
      reg.remove("triangles_prep").collect { case p: TriPrep => p }
        .foreach(_.edges.unpersist(false))
    }
  }

  private def prep(s: SparkSession, d: String): Prep = {
    val reg = SessionRegistry.of(s)
    reg.synchronized {
      // the regime gate is part of the prepared relation's SHAPE
      // (pre-partitioned or not), so a forced gate (the differential
      // test) builds its own prep instead of reusing the other regime's
      val key = s"pagerank_prep:$broadcastMaxBytes"
      reg.get(key).collect { case p: Prep if p.dir == d => p }.getOrElse {
        val pairs = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("cu"), (col("l_suppkey") * 2 + 1).as("su"))
          .distinct()
        // failure before registration must not pin caches for the session
        val edges = pairs.select(col("cu").as("src"), col("su").as("dst"))
          .unionAll(pairs.select(col("su").as("src"), col("cu").as("dst")))
          .persist()
        try {
          val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
          val nodes = deg.select(col("src").as("node")).persist()
          val p =
            try {
              val n = nodes.count() // node-sized; materializes the edge cache too
              val joined = edges.join(deg, "src")
              // Size the cached iteration relation's partitioning by the
              // MEASURED edge count, floored at the cluster parallelism:
              // cached plans skip AQE coalescing (spark.sql.optimizer.
              // canChangeCachedPlanOutputPartitioning is off by default),
              // and the fixed session shuffle-partition count would
              // undersplit a 100 TB edge relation. The parallelism floor
              // matters the other way: per-iteration compute (join + agg
              // over every edge) dominates task overhead, so dropping
              // below the core count serializes the loop (measured 2x
              // slower at sf0.1 with a single byte-sized partition).
              val e = edges.count() // narrow job over the already-persisted edges
              // The parallelism floor is DATA-BOUNDED (r16): flooring at the
              // raw core count anti-scaled — at sf0.1 the 10-iteration loop
              // ran ~2x slower on 32 cores than on 8 (driver scaling ratio
              // 0.56), because each iteration schedules `parts` tasks over a
              // node-sized relation and per-task overhead dominates compute
              // on tiny partitions. Floor at the core count only while each
              // core still gets >= MinPartitionBytes of edges; below that,
              // fewer-but-meaningful partitions win (guide §2.6/§9: size
              // partitions to bytes, not cores). At 100 TB the data term
              // dominates and the floor is irrelevant.
              val coreFloor = math.min(s.sparkContext.defaultParallelism.toLong,
                e * EdgeRowBytes / minPartitionBytes + 1)
              val parts = math.max(coreFloor,
                math.min(1L << 18, e * EdgeRowBytes / TargetPartitionBytes + 1)).toInt
              // Broadcast regime: pre-partition the cached edge relation by
              // dst. The per-iteration BroadcastHashJoin preserves the stream
              // side's HashPartitioning(dst), so the groupBy(dst) SUM needs
              // NO exchange — each iteration is one shuffle-free stage.
              // Non-broadcast regime: partition by src so the shuffle-hash
              // join co-locates with the node-sized rank shuffle; the
              // edge-sized contrib shuffle by dst is inherent there.
              val withDeg =
                (if (n * RankRowBytes <= broadcastMaxBytes) joined.repartition(parts, col("dst"))
                 else joined.repartition(parts, col("src"))).persist()
              try withDeg.count() // materialize from the edge cache
              catch {
                case t: Throwable => withDeg.unpersist(blocking = false); throw t
              }
              Prep(d, withDeg, nodes, n)
            } catch { case t: Throwable => nodes.unpersist(blocking = false); throw t }
          // a stale prep for ANOTHER dir under the same key must free its
          // caches (the TextOps.sharedPrep put-return discipline)
          reg.put(key, p).collect { case old: Prep if old.dir != d => old }
            .foreach(_.unpersistAll())
          p
        } finally edges.unpersist(blocking = false)
      }
    }
  }

  private[queries] def sparkImpl(s: SparkSession, d: String): DataFrame = {
    val p = prep(s, d)
    val useBroadcast = p.n * RankRowBytes <= broadcastMaxBytes
    val prInit = Scale / p.n
    val baseQ = ((Scale / p.n) * 15) / 100
    var ranks = p.nodes.select(col("node"), lit(prInit).as("pr"))
    def step(rankSide: DataFrame): DataFrame =
      p.withDeg.join(rankSide, col("src") === col("node"))
        .select(col("dst"), expr("pr DIV deg").as("contrib"))
        .groupBy("dst")
        .agg(sum(col("contrib")).as("csum"))
        .select(col("dst").as("node"), (lit(baseQ) + expr("(csum * 85) DIV 100")).as("pr"))
    if (useBroadcast) {
      // Broadcast regime: the rank relation is ≤ the broadcast gate BY
      // DEFINITION, so collecting it to the driver each iteration has the
      // same bounded memory exposure the broadcast itself imposes — and a
      // LocalRelation rank side makes each iteration exactly ONE job over
      // the dst-partitioned edge cache (broadcast of driver-local rows is
      // free; the groupBy(dst) needs no exchange; no localCheckpoint
      // block-store writes, nothing to unpersist).
      val schema = ranks.schema
      for (_ <- 1 to Iters) {
        val rows = step(broadcast(ranks)).collect().toSeq
        ranks = s.createDataFrame(rows.asJava, schema)
      }
    } else {
      for (_ <- 1 to Iters) {
        // eager localCheckpoint: cuts lineage, materializes the iteration
        val next = step(ranks.hint("shuffle_hash")).localCheckpoint()
        graft.util.Checkpoints.freeLocalCheckpoint(ranks) // superseded generation
        ranks = next
      }
    }
    val named = ranks.select(
      when(col("node") % 2 === 0, concat(lit("c"), expr("node DIV 2")))
        .otherwise(concat(lit("s"), expr("(node - 1) DIV 2"))).as("node"),
      col("pr"))
    val top = named.orderBy(col("pr").desc, col("node")).limit(TopK)
    val result = top.select(
      row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("pr").desc, col("node")))
        .as("rank"),
      col("node"), col("pr"))
      .orderBy("rank")
    // materialize the TopK-bounded result (driver-safe: TopK rows) so the
    // returned frame is a self-contained LocalRelation — then the FINAL
    // checkpoint generation can be freed right here, like its superseded
    // predecessors. Lazier schemes (parking the checkpoint and freeing it
    // on the next invocation) would invalidate a still-held previous
    // result: a localCheckpoint cannot recompute once unpersisted.
    val rows = result.collect().toSeq
    graft.util.Checkpoints.freeLocalCheckpoint(ranks)
    s.createDataFrame(rows.asJava, result.schema)
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

  // --- Triangle counting over the co-supplier similarity graph ---------
  //
  // Graph: suppliers weighted by shared-part count, SPARSIFIED to the
  // strongest [[TriEdges]] edges (deterministic (shared DESC, u, v)
  // top-K — the standard similarity-graph step; the raw co-part graph is
  // complete and meaningless). Spark counts triangles the distributed
  // way: per-node sorted adjacency arrays, then ONE pass over edges
  // evaluating the codegen'd [[graft.functions.SortedIntersectCount]]
  // merge walk — c(u,v) = |N(u)∩N(v)| = triangles through that edge, and
  // t(v) = Σ_{e∋v} c(e) / 2 (each triangle at v is seen by both its
  // v-incident edges). No 3-way self-join, no cartesian: two node-keyed
  // hash joins + one combinable aggregate, each bounded by the K edges.
  // The DuckDB oracle is an independently-shaped 3-way relational join
  // enumerating each a<b<c triangle once.
  //
  // 100 TB shape: the (p, s) distinct and pair-count aggregates are
  // ordinary shuffles; top-K is Spark's sort-limit (per-partition top-K,
  // K rows to the driver-side take); everything downstream is bounded by
  // K, not by the quadratic pair space.
  private val TriEdges = 5000
  private val TriTopK = 50

  private case class TriPrep(dir: String, edges: DataFrame)

  private def trianglesImpl(s: SparkSession, d: String): DataFrame = {
    graft.functions.SortedIntersectCount.register(s)
    // persist, not checkpoint: the CacheManager keys on the logical plan,
    // so REPEAT invocations (every bench pass) reuse the built edge cache
    // — an eager localCheckpoint would rebuild the quadratic pair
    // aggregate per call (measured 2.8s vs sub-second at sf0.1). Tracked
    // in the session registry (the pagerank prep discipline) so
    // [[dropCaches]] can free it at the bench group boundary.
    val reg = SessionRegistry.of(s)
    val edges = reg.synchronized {
      reg.get("triangles_prep").collect { case p: TriPrep if p.dir == d => p.edges }
        .getOrElse {
          val ps = Tables.lineitem(s, d)
            .select(col("l_partkey").as("p"), col("l_suppkey").as("sup")).distinct()
          val w = ps.as("a").join(ps.as("b"),
              col("a.p") === col("b.p") && col("a.sup") < col("b.sup"))
            .groupBy(col("a.sup").as("u"), col("b.sup").as("v"))
            .agg(count(lit(1)).as("shared"))
          val e = w.orderBy(desc("shared"), col("u"), col("v")).limit(TriEdges)
            .select("u", "v").persist()
          reg.put("triangles_prep", TriPrep(d, e))
            .collect { case p: TriPrep if p.dir != d => p }
            .foreach(_.edges.unpersist(false))
          e
        }
    }
    val adj = edges.select(col("u").as("s"), col("v").as("o"))
      .union(edges.select(col("v").as("s"), col("u").as("o")))
      .groupBy("s").agg(array_sort(collect_set(col("o").cast("string"))).as("nbrs"))
    // `cnt` feeds BOTH sides of the final union — without materialization
    // the neighbor-intersection join (the heavy op) runs twice (r15-opt
    // plan audit). Edge-count-bounded rows; materializing is free.
    val cnt = graft.util.Materialize.once(edges
      .join(adj.select(col("s").as("u"), col("nbrs").as("nu")), "u")
      .join(adj.select(col("s").as("v"), col("nbrs").as("nv")), "v")
      .select(col("u"), col("v"),
        expr("CAST(graft_intersect_count(nu, nv) AS BIGINT)").as("c")))
    cnt.select(col("u").as("supp"), col("c"))
      .union(cnt.select(col("v").as("supp"), col("c")))
      .groupBy("supp").agg(expr("CAST(SUM(c) DIV 2 AS BIGINT)").as("tri"))
      .filter(col("tri") > 0)
      .orderBy(desc("tri"), col("supp"))
      .limit(TriTopK)
  }

  private val trianglesDuck: String =
    s"""WITH ps AS (SELECT DISTINCT l_partkey p, l_suppkey s FROM lineitem),
       |w AS (SELECT a.s u, b.s v, COUNT(*) shared
       |      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s GROUP BY a.s, b.s),
       |edges AS (SELECT u, v FROM w ORDER BY shared DESC, u, v LIMIT $TriEdges),
       |tri AS (SELECT e1.u a, e1.v b, e2.v c
       |        FROM edges e1 JOIN edges e2 ON e2.u = e1.v
       |        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
       |pernode AS (SELECT node, COUNT(*) t FROM (
       |    SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
       |    UNION ALL SELECT c FROM tri) GROUP BY node)
       |SELECT CAST(node AS BIGINT) AS supp, CAST(t AS BIGINT) AS tri
       |FROM pernode ORDER BY tri DESC, supp LIMIT $TriTopK""".stripMargin

  def queries: Map[String, QueryDef] = Map(
    "graph_pagerank" -> QueryDef(sparkImpl _, duckSql),
    "graph_triangles" -> QueryDef(trianglesImpl _, trianglesDuck)
  )
}
