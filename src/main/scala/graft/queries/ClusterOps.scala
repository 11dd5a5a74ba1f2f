package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Embedding-space clustering ops: integer-exact spherical k-means and
  * SemDeDup-style semantic deduplication (cluster first, then compare
  * pairs ONLY within a cluster — Abbas et al. 2023, arXiv:2303.09540 —
  * so the corpus is never compared all-pairs).
  *
  * Determinism across engines follows the ANN stack's recipe
  * ([[AnnOps]]): embeddings quantize to BIGINT fixed-point (`floor(x *
  * 1000)`), every dot product is an exact BIGINT sum, centroid updates
  * are element-wise `SUM DIV COUNT` truncating integer division (Spark
  * `DIV` and DuckDB `//` both truncate toward zero), and the only
  * doubles are final cosine scores — `CAST(bigint AS DOUBLE)` division
  * and `sqrt`, correctly-rounded IEEE ops that agree bit-for-bit given
  * identical integer inputs. Assignment ties break on centroid id.
  *
  * Scale shape (100 TB):
  *  - assignment is a broadcast map pass — the centroid relation is K×d
  *    integers regardless of corpus size;
  *  - the centroid update is a combinable partial aggregate keyed on
  *    (cid, dim) — map-side combine reduces to K×d rows per executor
  *    before the one tiny shuffle;
  *  - iteration count is a fixed constant (3), each iteration one
  *    broadcast join + one combinable agg — no growing lineage, no
  *    checkpoint needed (the plan is [[KmIters]] chained CTEs, constant
  *    depth);
  *  - SemDeDup's pairwise stage joins members per cluster id, so the
  *    candidate count is Σ |cluster|² — bounded by clustering, not n².
  *    A degenerate giant cluster would need a secondary split (LSH bands
  *    within the cluster, as [[TextOps]] does for hot shingles); at K=8
  *    over the synthetic corpus the clusters stay balanced, and the
  *    within-cluster bound IS the operator's published contract.
  */
object ClusterOps {

  private val K = 8
  private val KmIters = 3
  private val Dims = 64
  private val DupThreshold = "0.25"

  private val sparkDot = "graft_dot(%s, %s)"
  private val duckDot = "CAST(list_dot_product(%s, %s) AS BIGINT)"

  /** The unrolled k-means CTE chain over a quantized-vector relation
    * `qn(vec_id, q, qnorm)`: cent0 = the K lowest-id vectors (externally
    * supplied deterministic seeds, the IVF convention), then per
    * iteration an assignment (`a_t`), membership (`m_t`), per-dimension
    * integer mean (`cd_t`) and rebuilt centroid (`cent_t`). The final
    * membership `m_[[KmIters]]` is the operator's output assignment.
    *
    * @param perDim  dialect fragment: FROM-clause join of members×vectors
    *                exploded to (cid, i, x) rows
    * @param rebuild dialect fragment: aggregate (cid, i, cx) rows back to
    *                a position-ordered BIGINT array
    */
  private def kmeansCtes(
      qn: String, dot: String,
      perDim: (String, String) => String,
      rebuild: String => String): String = {
    val cent0 =
      s"""cent0 AS (
         |  SELECT vec_id AS cid, q AS cq, ${dot.format("q", "q")} AS cnorm
         |  FROM $qn WHERE vec_id < $K)""".stripMargin
    val iters = (1 to KmIters).map { t =>
      val centDot = dot.format("v.q", "c.cq")
      s"""a$t AS (
         |  SELECT v.vec_id, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |      ORDER BY CAST($centDot AS DOUBLE) / sqrt(CAST(c.cnorm AS DOUBLE)) DESC, c.cid) AS rk
         |  FROM $qn v CROSS JOIN cent${t - 1} c),
         |m$t AS (SELECT vec_id, cid FROM a$t WHERE rk = 1),
         |cd$t AS (${perDim(s"m$t", qn)}),
         |cent$t AS (${rebuild(s"cd$t")})""".stripMargin
    }
    (cent0 +: iters).mkString(",\n")
  }

  private def sparkPerDim(members: String, qn: String): String =
    s"""
       |  SELECT cid, i, SUM(x) DIV COUNT(1) AS cx
       |  FROM (
       |    SELECT m.cid, pe.i, pe.x
       |    FROM $members m JOIN $qn v ON v.vec_id = m.vec_id
       |    LATERAL VIEW posexplode(v.q) pe AS i, x)
       |  GROUP BY cid, i""".stripMargin

  private def sparkRebuild(cd: String): String =
    s"""
       |  SELECT cid, cq, ${sparkDot.format("cq", "cq")} AS cnorm FROM (
       |    SELECT cid, transform(array_sort(collect_list(struct(i, cx))), s -> s.cx) AS cq
       |    FROM $cd GROUP BY cid)""".stripMargin

  private def duckPerDim(members: String, qn: String): String =
    s"""
       |  SELECT m.cid, di.i, CAST(SUM(list_extract(v.q, di.i + 1)) AS BIGINT) // COUNT(1) AS cx
       |  FROM $members m JOIN $qn v ON v.vec_id = m.vec_id, UNNEST(range(0, $Dims)) AS di(i)
       |  GROUP BY m.cid, di.i""".stripMargin

  private def duckRebuild(cd: String): String =
    s"""
       |  SELECT cid, cq, ${duckDot.format("cq", "cq")} AS cnorm FROM (
       |    SELECT cid, list(cx ORDER BY i) AS cq FROM $cd GROUP BY cid)""".stripMargin

  /** DuckDB re-derives the quantized relation inline (the Spark side
    * reads the session-shared `ann_qn` view, [[AnnOps.sparkPrep]]).
    */
  private val duckQn =
    s"""qe AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
       |  FROM embeddings),
       |qn AS (SELECT vec_id, q, ${duckDot.format("q", "q")} AS qnorm FROM qe)""".stripMargin

  private def kmeansMain(fin: String): String =
    s"""SELECT m.vec_id, CAST(m.cid AS INT) AS cid
       |FROM $fin m
       |ORDER BY vec_id""".stripMargin

  /** SemDeDup tail: within-cluster pairs above [[DupThreshold]] cosine
    * mark the higher-id member a duplicate of its lowest-id partner.
    */
  private def semdedupTail(fin: String, qn: String, dot: String): String = {
    val pairDot = dot.format("a.q", "b.q")
    s"""pairs AS (
       |  SELECT ma.vec_id AS keep_id, mb.vec_id AS dup_id,
       |    CAST($pairDot AS DOUBLE) / sqrt(CAST(a.qnorm AS DOUBLE) * CAST(b.qnorm AS DOUBLE)) AS score
       |  FROM $fin ma JOIN $fin mb ON ma.cid = mb.cid AND ma.vec_id < mb.vec_id
       |  JOIN $qn a ON a.vec_id = ma.vec_id
       |  JOIN $qn b ON b.vec_id = mb.vec_id),
       |dups AS (
       |  SELECT dup_id AS vec_id, MIN(keep_id) AS dup_of
       |  FROM pairs WHERE score >= $DupThreshold GROUP BY dup_id)
       |SELECT m.vec_id, CAST(m.cid AS INT) AS cid, d.dup_of,
       |  CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS kept
       |FROM $fin m LEFT JOIN dups d ON d.vec_id = m.vec_id
       |ORDER BY m.vec_id""".stripMargin
  }

  /** Simplified (centroid-based) silhouette per point over the final
    * assignment: a = cosine distance to the OWN final centroid, b = min
    * distance to any OTHER final centroid, s = (b-a)/max(a,b) ∈ [-1,1].
    * The curation signal behind prototypicality filtering — points with
    * low/negative s sit between clusters and are the first candidates to
    * drop or re-route. Emitted PER POINT (vec_id, cid, a, b, silhouette)
    * deliberately: every value is a chain of correctly-rounded IEEE ops
    * on exact BIGINT inputs (bit-identical cross-engine), whereas a
    * cluster-level AVG over doubles would reintroduce fp-summation
    * divergence — cluster rollups belong downstream as a decimal-sum
    * (the Relational.scala recipe). Scale shape: the distance relation
    * is row × K-broadcast-centroids (K×d ints), a pure map pass; the
    * per-point MIN/MAX group-by is combinable with K-bounded fan-in.
    */
  private def silhouetteTail(fin: String, cent: String, qn: String, dot: String): String = {
    val d = dot.format("v.q", "c.cq")
    s"""dists AS (
       |  SELECT m.vec_id, m.cid AS own_cid, c.cid AS ccid,
       |    1.0 - CAST($d AS DOUBLE) /
       |      sqrt(CAST(v.qnorm AS DOUBLE) * CAST(c.cnorm AS DOUBLE)) AS dist
       |  FROM $fin m JOIN $qn v ON v.vec_id = m.vec_id CROSS JOIN $cent c),
       |sil AS (
       |  SELECT vec_id, own_cid,
       |    MAX(CASE WHEN ccid = own_cid THEN dist END) AS a,
       |    MIN(CASE WHEN ccid <> own_cid THEN dist END) AS b
       |  FROM dists GROUP BY vec_id, own_cid)
       |SELECT vec_id, CAST(own_cid AS INT) AS cid, a, b,
       |  CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS DOUBLE)
       |       ELSE (b - a) / greatest(a, b) END AS silhouette
       |FROM sil ORDER BY vec_id""".stripMargin
  }

  /** Session-shared CONVERGED clustering (the AnnOps.sparkPrep contract):
    * the k-means CTE chain runs ONCE per (session, sf dir) and its two
    * outputs — the final membership `m_KmIters` and the final centroids
    * `cent_KmIters` — persist as the `cluster_members` / `cluster_cents`
    * views all six cluster entries read. Before this, every entry
    * re-ran the full [[KmIters]]-iteration chain from scratch (six
    * entries × the whole chain — the r11 plan audit priced it at
    * ~10-15s of the warm suite); this is also the production shape:
    * cluster once, read many. The centroids are recomputed FROM the
    * persisted membership (`cent_N = rebuild(perDim(m_N))` holds by
    * construction of the chain's last iteration), so the chain itself
    * executes exactly once. DuckDB keeps the single-statement CTE text —
    * the oracle re-derives the identical integer-exact chain inline.
    */
  private case class Prep(dir: String, dfs: Seq[DataFrame])

  private[queries] def clusterPrep(s: SparkSession, d: String): Unit = {
    AnnOps.sparkPrep(s, d) // ann_qn view + graft_dot
    val reg = SessionRegistry.of(s)
    reg.synchronized {
      val cached = reg.get("clusterprep").collect { case p: Prep if p.dir == d => p }
      val Seq(members, cents) = cached.map(_.dfs).getOrElse {
        // localCheckpoint, not persist (the pqPrep contract): the chain
        // is KmIters unrolled CTE iterations deep, and a persisted plan
        // that deep behind a temp view both re-analyzes per query and
        // trips the optimizer's CTE inlining under the View node —
        // checkpointing collapses both outputs to leaf RDD scans (tiny:
        // n×2 longs and K rows). Eager, so the chain executes HERE,
        // exactly once.
        val members = s.sql(
          s"WITH ${kmeansCtes("ann_qn", sparkDot, sparkPerDim, sparkRebuild)}\n" +
            s"SELECT vec_id, cid FROM m$KmIters").localCheckpoint(true)
        val cents =
          try {
            // cent_N = rebuild(perDim(m_N)) holds by construction of the
            // chain's last iteration: one aggregate pass over the
            // checkpointed membership, never a second chain run
            members.createOrReplaceTempView("cluster_members")
            s.sql(sparkRebuild(s"(${sparkPerDim("cluster_members", "ann_qn")})")
              .stripLeading()).localCheckpoint(true)
          } catch {
            case t: Throwable =>
              graft.util.Checkpoints.freeLocalCheckpoint(members); throw t
          }
        val dfs = Seq(members, cents)
        reg.put("clusterprep", Prep(d, dfs))
          .collect { case p: Prep if p.dir != d => p }
          .foreach(_.dfs.foreach(df => graft.util.Checkpoints.freeLocalCheckpoint(df)))
        cents.createOrReplaceTempView("cluster_cents")
        dfs
      }
      // re-register only when missing/dropped (NOT unconditionally on a
      // fresh build, which registered both above): replacing a temp view
      // cascades cache invalidation through the CacheManager
      if (!s.catalog.tableExists("cluster_members") ||
          !s.catalog.tableExists("cluster_cents")) {
        members.createOrReplaceTempView("cluster_members")
        cents.createOrReplaceTempView("cluster_cents")
      }
    }
  }

  /** Remove and unpersist the cached clustering (bench group-boundary
    * hygiene and the invalidation spec's cleanup).
    */
  private[graft] def dropCaches(s: SparkSession): Unit = {
    val reg = SessionRegistry.of(s)
    reg.synchronized {
      reg.remove("clusterprep").collect { case p: Prep => p }
        .foreach(_.dfs.foreach(df => graft.util.Checkpoints.freeLocalCheckpoint(df)))
    }
  }

  private def sparkKmeansSql: String = kmeansMain("cluster_members")

  private def duckKmeansSql: String =
    s"WITH $duckQn,\n${kmeansCtes("qn", duckDot, duckPerDim, duckRebuild)}\n${kmeansMain(s"m$KmIters")}"

  private def sparkSemdedupSql: String =
    s"WITH ${semdedupTail("cluster_members", "ann_qn", sparkDot)}"

  private def duckSemdedupSql: String =
    s"WITH $duckQn,\n${kmeansCtes("qn", duckDot, duckPerDim, duckRebuild)},\n" +
      semdedupTail(s"m$KmIters", "qn", duckDot)

  /** Prototype extraction per cluster (the SSL-prototypes pruning
    * signal, Sorscher et al. 2022, arXiv:2206.14486): the [[ProtoK]]
    * members MOST aligned with their own final centroid, ranked by
    * cosine (ties on vec_id). Two query shapes over the same result:
    * the plain per-cluster window, and a SALTED TWO-PHASE variant
    * (`embed_prototypes_scale`) that ranks within (cid, salt) buckets
    * first and re-ranks only the bucket survivors — the 100 TB shape,
    * since PARTITION BY cid alone is K-way parallelism (K=8) no matter
    * the corpus size, while phase one fans out K×[[ProtoSalt]] ways and
    * phase two ranks ≤ K×salt×k rows. Identical output by construction
    * (each bucket keeps its own top-k, so the global per-cluster top-k
    * survives phase one), pinned by both entries sharing one oracle.
    */
  private val ProtoK = 10
  private val ProtoSalt = 16

  private def protoScored(fin: String, cent: String, qn: String, dot: String): String = {
    val d = dot.format("v.q", "c.cq")
    s"""scored AS (
       |  SELECT m.vec_id, m.cid,
       |    CAST($d AS DOUBLE) /
       |      sqrt(CAST(v.qnorm AS DOUBLE) * CAST(c.cnorm AS DOUBLE)) AS proto_score
       |  FROM $fin m JOIN $qn v ON v.vec_id = m.vec_id
       |  JOIN $cent c ON c.cid = m.cid)""".stripMargin
  }

  private def protoTail(fin: String, cent: String, qn: String, dot: String): String =
    s"""${protoScored(fin, cent, qn, dot)},
       |ranked AS (
       |  SELECT vec_id, cid, proto_score,
       |    ROW_NUMBER() OVER (PARTITION BY cid
       |      ORDER BY proto_score DESC, vec_id) AS rk
       |  FROM scored)
       |SELECT vec_id, CAST(cid AS INT) AS cid, proto_score, CAST(rk AS INT) AS rk
       |FROM ranked WHERE rk <= $ProtoK ORDER BY cid, rk""".stripMargin

  private def protoTailSalted(fin: String, cent: String, qn: String, dot: String): String =
    s"""${protoScored(fin, cent, qn, dot)},
       |phase1 AS (
       |  SELECT vec_id, cid, proto_score,
       |    ROW_NUMBER() OVER (PARTITION BY cid, vec_id % $ProtoSalt
       |      ORDER BY proto_score DESC, vec_id) AS rk1
       |  FROM scored),
       |ranked AS (
       |  SELECT vec_id, cid, proto_score,
       |    ROW_NUMBER() OVER (PARTITION BY cid
       |      ORDER BY proto_score DESC, vec_id) AS rk
       |  FROM phase1 WHERE rk1 <= $ProtoK)
       |SELECT vec_id, CAST(cid AS INT) AS cid, proto_score, CAST(rk AS INT) AS rk
       |FROM ranked WHERE rk <= $ProtoK ORDER BY cid, rk""".stripMargin

  private def sparkSilhouetteSql: String =
    s"WITH ${silhouetteTail("cluster_members", "cluster_cents", "ann_qn", sparkDot)}"

  private def duckSilhouetteSql: String =
    s"WITH $duckQn,\n${kmeansCtes("qn", duckDot, duckPerDim, duckRebuild)},\n" +
      silhouetteTail(s"m$KmIters", s"cent$KmIters", "qn", duckDot)

  /** Per-cluster size + inertia over the final assignment — the k-means
    * objective (elbow-method signal) as a combinable keyed aggregate, K
    * rows out. INTEGER-exact end-to-end: in the quantized space the
    * squared euclidean distance is `qnorm + cnorm − 2·dot`, all BIGINT,
    * so the per-cluster sum needs no fp at all. Pinned to BIGINT on
    * both engines (DuckDB alone would widen SUM(BIGINT) to HUGEINT, a
    * type the oracle bridge can't compare) — exact past 10⁹ rows per
    * cluster at these magnitudes; a corpus beyond that widens the
    * accumulator to DECIMAL(38,0) and rolls up the per-cluster decimals
    * downstream.
    */
  private def clusterStatsTail(fin: String, cent: String, qn: String, dot: String): String = {
    val d = dot.format("v.q", "c.cq")
    s"""dists AS (
       |  SELECT m.cid, v.qnorm + c.cnorm - 2 * $d AS sqdist
       |  FROM $fin m JOIN $qn v ON v.vec_id = m.vec_id
       |  JOIN $cent c ON c.cid = m.cid)
       |SELECT CAST(cid AS INT) AS cid, COUNT(1) AS n,
       |  CAST(SUM(sqdist) AS BIGINT) AS inertia
       |FROM dists GROUP BY cid ORDER BY cid""".stripMargin
  }

  private def sparkProtoSql: String =
    s"WITH ${protoTail("cluster_members", "cluster_cents", "ann_qn", sparkDot)}"

  private def sparkProtoSaltedSql: String =
    s"WITH ${protoTailSalted("cluster_members", "cluster_cents", "ann_qn", sparkDot)}"

  private def duckProtoSql: String =
    s"WITH $duckQn,\n${kmeansCtes("qn", duckDot, duckPerDim, duckRebuild)},\n" +
      protoTail(s"m$KmIters", s"cent$KmIters", "qn", duckDot)

  private def sparkClusterStatsSql: String =
    s"WITH ${clusterStatsTail("cluster_members", "cluster_cents", "ann_qn", sparkDot)}"

  private def duckClusterStatsSql: String =
    s"WITH $duckQn,\n${kmeansCtes("qn", duckDot, duckPerDim, duckRebuild)},\n" +
      clusterStatsTail(s"m$KmIters", s"cent$KmIters", "qn", duckDot)

  private def runSpark(main: => String)(s: SparkSession, d: String): DataFrame = {
    clusterPrep(s, d)
    s.sql(main)
  }

  def queries: Map[String, QueryDef] = Map(
    "embed_kmeans" -> QueryDef(runSpark(sparkKmeansSql) _, duckKmeansSql),
    "embed_semdedup" -> QueryDef(runSpark(sparkSemdedupSql) _, duckSemdedupSql),
    "embed_silhouette" -> QueryDef(runSpark(sparkSilhouetteSql) _, duckSilhouetteSql),
    "embed_prototypes" -> QueryDef(runSpark(sparkProtoSql) _, duckProtoSql),
    // the salted two-phase 100 TB shape, same oracle (identical by
    // construction — see protoTailSalted)
    "embed_prototypes_scale" -> QueryDef(runSpark(sparkProtoSaltedSql) _, duckProtoSql),
    "embed_cluster_stats" -> QueryDef(runSpark(sparkClusterStatsSql) _, duckClusterStatsSql)
  )
}
