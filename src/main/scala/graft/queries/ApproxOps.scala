package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Approximation-first operators for the 100 TB regime: cardinality and
  * frequency SKETCHES whose state is O(1) regardless of input size, a
  * hash-sampled quantile estimator, and BM25 ranked retrieval. The exact
  * counterparts already in the suite (`dedup_exact`, `q_percentile_disc`,
  * `text_heavy_hitters`) are the baselines these trade against: at 100 TB
  * an exact COUNT(DISTINCT) is a corpus-wide shuffle of every distinct
  * value, while the HLL register table below is 256 longs per group.
  *
  * Everything is a pure Catalyst plan (no UDFs) with a bit-exact DuckDB
  * oracle. Determinism across engines comes from the same discipline as
  * TextOps/PipelineOps:
  *  - randomness is md5 (both engines produce identical hex), widened to a
  *    60-bit BIGINT (15 hex chars — the [[graft.queries]] digest idiom);
  *  - register/bucket math stays in exact BIGINT land (`DIV`/`%`/shifts,
  *    `bin()` string length instead of log2 for the leading-zero rank);
  *  - the only floating-point steps are single correctly-rounded IEEE ops
  *    (`*`, `/`, `floor`) over identical operands in a parenthesis-fixed
  *    order — no `ln`/`exp`/`pow`, whose libm rounding differs by engine.
  *
  * Scale shapes (100 TB):
  *  - HLL: explode → per-(group, bucket) MAX — a combinable aggregate with
  *    map-side partials; register tables are `groups x 256` rows. No
  *    window, no distinct shuffle on the hashed stream. (The exact-distinct
  *    column in the output is the ORACLE-SIDE audit of sketch accuracy —
  *    at production scale the sketch replaces it, not rides next to it.)
  *  - CMS: the sketch is a fixed `d x w` cell grid (4 x 512 here) built by
  *    one combinable count aggregate over the token stream; point lookups
  *    join a broadcast-sized probe relation against the cell grid.
  *  - Sampled quantiles: a deterministic hash predicate thins the sort
  *    input 10x BEFORE the per-group rank — the nearest-rank window then
  *    runs on the sample. Error shrinks with the sample, cost with the
  *    rate; the exact twin (`q_percentile_disc`) is the accuracy baseline.
  *  - BM25: tokens are filtered to the query's terms at the explode (the
  *    term list is a broadcast relation), so tf/df/score never see
  *    non-matching tokens; the global top-k is ORDER BY + LIMIT, which
  *    Spark executes as TakeOrdered (per-partition heaps + driver merge of
  *    k rows), never a single-partition global window.
  */
object ApproxOps {

  /** 60-bit non-negative BIGINT from md5 — identical bits in both engines. */
  private def hash60(spark: Boolean, x: String): String = CrossEngine.hash60(spark, x)

  /** DuckDB SUM/window counts come back HUGEINT/BIGINT where Spark has
    * BIGINT/INT; the duck side casts to match Spark's types exactly.
    */
  private def big(spark: Boolean, e: String): String =
    if (spark) e else s"CAST($e AS BIGINT)"

  private def sq(s: SparkSession, d: String, tables: Seq[String])(sql: String): DataFrame = {
    tables.foreach(n => Tables.ensureView(s, d, n)(Tables.load(s, d, n)))
    s.sql(sql)
  }

  // --- HLL-style distinct-cardinality sketch -------------------------------
  // Flajolet et al. 2007 registers, m = 2^8: the top 8 hash bits pick the
  // register, the rank of the remaining 52 bits' leading 1 updates it via
  // MAX. The raw estimate alpha_m * m^2 / SUM(2^-rho) is computed from an
  // EXACT integer S = SUM(2^(53-rho)) (fits: 256 * 2^53 < 2^62), so the
  // only float ops are two multiplies and one divide over identical
  // operands. Below the standard 2.5m small-range threshold the estimate
  // switches to linear counting m*ln(m/V) (V = empty registers) — the ln
  // rounds to 8 decimals before the multiply, the text_lm_bigram
  // discipline for absorbing cross-libm ulp drift.
  private val M = 256
  private val Alpha = "0.7182725932495458" // 0.7213 / (1 + 1.079/m), m = 256
  private val Pow52 = "4503599627370496" // 2^52: bucket DIV / remainder split
  private val Pow53 = "9007199254740992" // 2^53: empty-register term

  /** The `regs`/`agg` CTE pair of the HLL register build — ONE spelling
    * of the bucket split / leading-zero rank / register-sum math shared
    * by both sketches, grouped by `group` over the 60-bit hashes produced
    * by `hashedFrom` (a subquery yielding ($group, h)).
    */
  private def hllRegisterCtes(spark: Boolean, group: String, hashedFrom: String): String = {
    val idiv = if (spark) "DIV" else "//"
    val shl =
      if (spark) "shiftleft(CAST(1 AS BIGINT), 53 - rho)"
      else "(CAST(1 AS BIGINT) << (53 - rho))"
    s"""regs AS (
       |  SELECT $group, h $idiv $Pow52 AS bucket,
       |    MAX(CASE WHEN h % $Pow52 = 0 THEN 53
       |             ELSE 53 - length(bin(h % $Pow52)) END) AS rho
       |  FROM ($hashedFrom)
       |  GROUP BY $group, h $idiv $Pow52),
       |agg AS (
       |  SELECT $group, COUNT(1) AS filled, ${big(spark, s"SUM($shl)")} AS s_filled
       |  FROM regs GROUP BY $group)""".stripMargin
  }

  /** The corrected estimate over an `agg` row (columns `filled`,
    * `s_filled`): raw harmonic-mean estimate, or linear counting in the
    * small range (raw <= 2.5m and some register still empty).
    */
  private def hllEstimate(aggRef: String): String = {
    val raw =
      s"""((CAST($Alpha AS DOUBLE) * ${M * M}.0) * $Pow53.0)
         |    / CAST($aggRef.s_filled + ($M - $aggRef.filled) * $Pow53 AS DOUBLE)""".stripMargin
    s"""CASE WHEN $aggRef.filled < $M AND ($raw) <= ${(2.5 * M).toInt}.0
       |  THEN ${M}.0 * round(ln(${M}.0 / CAST($M - $aggRef.filled AS DOUBLE)), 8)
       |  ELSE ($raw) END""".stripMargin
  }

  private def hllSql(spark: Boolean, gramsRel: Option[String] = None): String = {
    val split = if (spark) "split(text, ' ')" else "string_split(text, ' ')"
    val grams =
      if (spark)
        """explode(CASE WHEN size(a) >= 3
          |  THEN transform(sequence(1, size(a) - 2), i -> concat_ws(' ', slice(a, i, 3)))
          |  ELSE array() END)""".stripMargin
      else
        """UNNEST(CASE WHEN len(a) >= 3
          |  THEN list_transform(range(1, len(a) - 1), i -> array_to_string(a[i:i+2], ' '))
          |  ELSE [] END)""".stripMargin
    val gramsCte = gramsRel.map(r => s"SELECT source, gram FROM $r").getOrElse(
      s"""SELECT source, $grams AS gram
         |  FROM (SELECT source, $split AS a FROM documents)""".stripMargin)
    s"""WITH grams AS ($gramsCte),
       |${hllRegisterCtes(spark, "source", s"SELECT source, ${hash60(spark, "gram")} AS h FROM grams")},
       |exact AS (
       |  SELECT source, COUNT(DISTINCT gram) AS exact_distinct FROM grams GROUP BY source)
       |SELECT a.source, a.filled,
       |  ${hllEstimate("a")} AS est_distinct,
       |  e.exact_distinct
       |FROM agg a JOIN exact e ON a.source = e.source
       |ORDER BY a.source""".stripMargin
  }

  // --- HLL column profile (ANALYZE TABLE, sketch-backed) -------------------
  // The table-profiling pass a pipeline runs before planning joins and
  // mixes: per column, row/null counts and an HLL distinct estimate.
  // Rows unpivot to (colname, value) via a CASE against a 6-row
  // column-name relation (the portable spelling of stack/UNPIVOT), and
  // the unpivot feeds TWO aggregates — the row/null/exact stats and the
  // sketch_hll_distinct register math per column. An all-NULL column
  // still profiles (LEFT JOIN + zero registers → linear counting reports
  // 0 distinct) instead of vanishing from the output. Only integer- and
  // string-typed columns are profiled: a float column's CAST-to-string
  // rendering is engine-specific (the exact-distinct audit would be fine,
  // but the hashed VALUES must be byte-identical).
  private val ProfileCols =
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_returnflag", "l_linestatus")

  private def profileSql(spark: Boolean, valsRel: Option[String] = None): String = {
    val str = CrossEngine.strType(spark)
    val names = ProfileCols.map(c => s"SELECT '$c' AS colname").mkString(" UNION ALL ")
    val cases = ProfileCols.map(c => s"WHEN '$c' THEN CAST($c AS $str)").mkString(" ")
    val valsCte = valsRel.map(r => s"SELECT colname, v FROM $r").getOrElse(
      s"""SELECT c.colname, CASE c.colname $cases END AS v
         |  FROM lineitem CROSS JOIN cols c""".stripMargin)
    s"""WITH cols AS ($names),
       |vals AS ($valsCte),
       |stats AS (
       |  SELECT colname, COUNT(1) AS n_rows,
       |    ${big(spark, "SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END)")} AS n_null,
       |    COUNT(DISTINCT v) AS exact_distinct
       |  FROM vals GROUP BY colname),
       |${hllRegisterCtes(spark, "colname",
          s"SELECT colname, ${hash60(spark, "v")} AS h FROM vals WHERE v IS NOT NULL")},
       |a2 AS (
       |  SELECT s.colname, s.n_rows, s.n_null, s.exact_distinct,
       |    COALESCE(a.filled, 0) AS filled,
       |    COALESCE(a.s_filled, 0) AS s_filled
       |  FROM stats s LEFT JOIN agg a ON s.colname = a.colname)
       |SELECT a2.colname, a2.n_rows, a2.n_null,
       |  ${hllEstimate("a2")} AS est_distinct,
       |  a2.exact_distinct
       |FROM a2
       |ORDER BY a2.colname""".stripMargin
  }

  // --- Count-min sketch ----------------------------------------------------
  // Cormode & Muthukrishnan 2005: d=4 rows x w=512 counters; each token
  // occurrence increments one counter per row (hash salted by the row id);
  // a point estimate is the MIN over the d counters — never an
  // underestimate (the `overcount` output column is the per-probe audit).
  private val CmsD = 4
  private val CmsW = 512
  private val CmsProbes = Seq("data", "spark", "join", "table", "row", "fast", "scan", "filter")

  /** `occRel` points the token-occurrence CTE at a pre-materialized view
    * (Spark inlines the CTE and tokenizes the corpus twice otherwise —
    * once for the sketch cells, once for the exact-count audit).
    */
  private def cmsSql(spark: Boolean, occRel: Option[String] = None): String = {
    val explodeToks = occRel.map(r => s"SELECT tok FROM $r").getOrElse(
      if (spark) "SELECT explode(split(text, ' ')) AS tok FROM documents"
      else "SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents")
    val rows = (0 until CmsD).map(i => s"SELECT $i AS i").mkString(" UNION ALL ")
    val probes = CmsProbes.map(p => s"SELECT '$p' AS tok").mkString(" UNION ALL ")
    def cell(tokRef: String) = s"${hash60(spark, s"CONCAT(r.i, ':', $tokRef)")} % $CmsW"
    s"""WITH occ AS ($explodeToks),
       |rows_d AS ($rows),
       |cells AS (
       |  SELECT i, bucket, COUNT(1) AS c
       |  FROM (SELECT r.i AS i, ${cell("o.tok")} AS bucket
       |        FROM occ o CROSS JOIN rows_d r)
       |  GROUP BY i, bucket),
       |probes AS ($probes),
       |pb AS (
       |  SELECT p.tok, r.i AS i, ${cell("p.tok")} AS bucket
       |  FROM probes p CROSS JOIN rows_d r),
       |est AS (
       |  SELECT pb.tok, MIN(COALESCE(c.c, CAST(0 AS BIGINT))) AS cms_count
       |  FROM pb LEFT JOIN cells c ON c.i = pb.i AND c.bucket = pb.bucket
       |  GROUP BY pb.tok),
       |exact AS (
       |  SELECT o.tok, COUNT(1) AS n
       |  FROM occ o JOIN probes p ON o.tok = p.tok GROUP BY o.tok)
       |SELECT e.tok, e.cms_count,
       |  COALESCE(x.n, CAST(0 AS BIGINT)) AS exact_count,
       |  e.cms_count - COALESCE(x.n, CAST(0 AS BIGINT)) AS overcount
       |FROM est e LEFT JOIN exact x ON e.tok = x.tok
       |ORDER BY e.tok""".stripMargin
  }

  // --- Hash-sampled nearest-rank quantiles ---------------------------------
  // The q_percentile_disc shape over a DETERMINISTIC 10% sample: the
  // md5-derived row hash is a pure key function (append-stable, engine-
  // identical — the sample_split idiom), so both engines rank the same
  // sample. Estimates are actual data values (nearest rank on the sample),
  // keeping the output hash-stable; the unsampled twin is the baseline.
  private def sampledPctSql(spark: Boolean): String = {
    val n1 = big(spark, "COUNT(1)")
    s"""WITH s AS (
       |  SELECT l_returnflag, l_extendedprice AS v
       |  FROM lineitem
       |  WHERE ${hash60(spark, "CONCAT(l_orderkey, ':', l_linenumber)")} % 10 = 0),
       |ranked AS (
       |  SELECT l_returnflag, v,
       |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn,
       |    COUNT(1) OVER (PARTITION BY l_returnflag) AS n
       |  FROM s)
       |SELECT l_returnflag,
       |  MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS p50_est,
       |  MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN v END) AS p95_est,
       |  $n1 AS n_sample
       |FROM ranked
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin
  }

  // --- BM25 ranked retrieval -----------------------------------------------
  // Robertson/Okapi scoring (k1 = 1.2, b = 0.75) with the suite's rational
  // idf discipline: idf = (N - df + 0.5)/(df + 0.5) — the log() of textbook
  // BM25 is monotone, so top-k membership per term is preserved while the
  // score stays a short fixed sequence of IEEE ops. Per-term scores are
  // quantized to 1e-6 fixed point BEFORE the per-doc SUM so the aggregate
  // is an order-independent exact BIGINT sum (float sums reassociate under
  // shuffle and would not hash-match — same reason the KL/bigram entries
  // quantize before aggregating).
  private val Bm25Terms = Seq("spark", "join", "fast")

  /** `dlRel`/`tfRel` point the dl / tf CTEs at pre-materialized views:
    * both are referenced twice downstream and Spark inlines deterministic
    * CTEs per reference, so the single-statement form tokenizes the
    * corpus twice and length-scans it twice (r15-opt plan audit).
    * [[bm25Impl]] materializes each once per invocation; the DuckDB
    * oracle keeps the self-contained form (None).
    */
  private def bm25Sql(
      spark: Boolean, dlRel: Option[String] = None, tfRel: Option[String] = None): String = {
    val explodeToks =
      if (spark) "SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents"
      else "SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents"
    val dlExpr = if (spark) "size(split(text, ' '))" else "len(string_split(text, ' '))"
    val terms = Bm25Terms.map(t => s"SELECT '$t' AS term").mkString(" UNION ALL ")
    val rank = big(spark, "SUM(score_q)")
    val rn =
      if (spark) "ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)"
      else "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT)"
    val dlCte = dlRel.map(r => s"dl AS (SELECT doc_id, dl FROM $r)")
      .getOrElse(s"dl AS (SELECT doc_id, $dlExpr AS dl FROM documents)")
    val tfCte = tfRel.map(r => s"tf AS (SELECT doc_id, term, tf FROM $r)")
      .getOrElse(
        s"""tf AS (
           |  SELECT doc_id, tok AS term, COUNT(1) AS tf
           |  FROM ($explodeToks) o
           |  JOIN terms t ON o.tok = t.term
           |  GROUP BY doc_id, tok)""".stripMargin)
    s"""WITH $dlCte,
       |stats AS (SELECT COUNT(1) AS n_docs, ${big(spark, "SUM(dl)")} AS tot FROM dl),
       |terms AS ($terms),
       |$tfCte,
       |df AS (SELECT term, COUNT(1) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT tf.doc_id,
       |    CAST(floor(
       |      (((CAST(s.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE)) + 0.5)
       |         / (CAST(df.df AS DOUBLE) + 0.5))
       |      * ((CAST(tf.tf AS DOUBLE) * 2.2)
       |         / (CAST(tf.tf AS DOUBLE)
       |            + (1.2 * (0.25 + ((0.75 * CAST(d.dl AS DOUBLE))
       |                              / (CAST(s.tot AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))))))
       |      * 1000000.0) AS BIGINT) AS score_q
       |  FROM tf
       |  JOIN df ON tf.term = df.term
       |  JOIN dl d ON d.doc_id = tf.doc_id
       |  CROSS JOIN stats s),
       |docscore AS (
       |  SELECT doc_id, $rank AS score, COUNT(1) AS n_terms
       |  FROM scored GROUP BY doc_id),
       |top AS (SELECT doc_id, score, n_terms FROM docscore ORDER BY score DESC, doc_id LIMIT 10)
       |SELECT $rn AS rank, doc_id, score, n_terms
       |FROM top
       |ORDER BY rank""".stripMargin
  }

  def queries: Map[String, QueryDef] = Map(
    // sketch_hll_distinct stays inline: the trigram stream is a ~3x byte
    // expansion and the materialized form measured 0.66 -> 0.77s in-suite
    // (materialize reductions, never expansions)
    "sketch_hll_distinct" -> QueryDef(
      (s, d) => sq(s, d, Seq("documents"))(hllSql(spark = true)),
      hllSql(spark = false)),
    // sketch_profile deliberately stays the inline-CTE form: the unpivot
    // is a 6x row blowup of lineitem, and materializing it (measured
    // r15-opt) cost 2.1s vs 0.57s for re-running two cheap columnar
    // scans — the repeated subtree is only worth materializing when it
    // REDUCES the data (aggregates/filters), not when it expands it.
    "sketch_profile" -> QueryDef(
      (s, d) => sq(s, d, Seq("lineitem"))(profileSql(spark = true)),
      profileSql(spark = false)),
    // sketch_cms_counts stays inline: the token stream is 1:1 with the
    // corpus bytes (no reduction to materialize) and the materialized
    // form measured 0.39 -> 0.51s in-suite
    "sketch_cms_counts" -> QueryDef(
      (s, d) => sq(s, d, Seq("documents"))(cmsSql(spark = true)),
      cmsSql(spark = false)),
    "q_percentile_sampled" -> QueryDef(
      (s, d) => sq(s, d, Seq("lineitem"))(sampledPctSql(spark = true)),
      sampledPctSql(spark = false)),
    // Inline CTEs, deliberately: the r15-opt materialization of the dl/tf
    // subtrees (each referenced 2x) was A/B-adjudicated a REAL regression
    // in r16 — isolated min-of-5 on one box, r15-build inline 0.653 s vs
    // materialized 1.351 s (localCheckpoint r15 variant 1.181 s). Two
    // pushdown-pruned columnar re-scans of `documents` are cheaper than
    // one materialize+re-read of a corpus-sized (doc_id, dl) relation:
    // materialize only when the subtree is referenced 3x+ AND the
    // materialized relation is far below the subtree's input bytes.
    "text_bm25_topk" -> QueryDef(
      ((s: SparkSession, d: String) => {
        Tables.ensureView(s, d, "documents")(Tables.load(s, d, "documents"))
        s.sql(bm25Sql(spark = true))
      }),
      bm25Sql(spark = false)),
  )
}
