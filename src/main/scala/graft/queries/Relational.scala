package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Relational operator coverage over the TPC-H-ish test tables.
  *
  * The reference (apache/hudi-rs) delegates all relational work to its host
  * engine (DataFusion — /root/reference/README.md:396-412); in our engine it
  * is delegated to Catalyst. These queries pin the delegation surface with a
  * DuckDB oracle: joins (broadcast + shuffle), aggregates, windows, sorts,
  * limits, set ops, semi/anti joins, predicate/projection pushdown.
  *
  * Float determinism: every aggregated fp column is cast to DECIMAL before
  * SUM (exact, order-independent) and the final result cast back to DOUBLE,
  * so Spark and DuckDB produce bit-identical values regardless of partial
  * aggregation order. Per-row fp arithmetic is IEEE-deterministic already.
  */
object Relational {
  import Tables._

  /** "Orders above twice their customer's average" spelled as
    * `price * count > 2 * sum` — every comparand an EXACT decimal/int
    * product (an AVG would divide, and decimal-division scale rules and
    * DuckDB's double AVG both break cross-engine bit-equality). The
    * same text runs on both engines: Catalyst de-correlates the two
    * scalar subqueries into aggregate + equi-join
    * (RewriteCorrelatedScalarSubquery), DuckDB plans them natively.
    */
  private val scalarSubquerySql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice
      |FROM orders o
      |WHERE CAST(o_totalprice AS DECIMAL(18,4)) *
      |    (SELECT COUNT(1) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |  > 2 * (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,4)))
      |         FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** See [[graft.util.ExactAgg.dsum]] — the shared exact-sum contract. */
  private def dsum(c: Column): Column = graft.util.ExactAgg.dsum(c)

  /** Shared ROLLUP/CUBE entry builder (see the q_rollup/q_cube comment). */
  private def groupingLattice(
      group: DataFrame => org.apache.spark.sql.RelationalGroupedDataset,
      sqlOp: String): QueryDef =
    QueryDef(
      (s, d) =>
        group(lineitem(s, d))
          .agg(
            grouping(col("l_returnflag")).cast(IntegerType).as("g_flag"),
            grouping(col("l_linestatus")).cast(IntegerType).as("g_status"),
            dsum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n_rows"))
          .orderBy(
            col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first,
            col("g_flag"), col("g_status")),
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
         |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         |  COUNT(1) AS n_rows
         |FROM lineitem
         |GROUP BY $sqlOp(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST,
         |  g_flag, g_status""".stripMargin)

  private val q19Sql: String =
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
      |    (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE)
      |  AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11
      |       AND p_size BETWEEN 1 AND 15)
      |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20
      |       AND p_size BETWEEN 1 AND 25)
      |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
      |       AND p_size BETWEEN 1 AND 35)""".stripMargin

  private val qs: Map[String, QueryDef] = Map(
    // --- selective filter + single aggregate (TPC-H Q6 shape) ------------
    // The canonical predicate-pushdown probe: every filter reaches the
    // parquet scan (date range + two numeric bands), and the lone product
    // sum follows the q1 decimal discipline ((12,4) factors -> (25,8)
    // exact product, DECIMAL sum, round to 4 dp before the double cast).
    "q6_forecast_revenue" -> QueryDef(
      (s, d) => {
        lineitem(s, d).filter(
          col("l_shipdate") >= lit("1994-01-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1995-01-01").cast(TimestampType) &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(round(sum(col("l_extendedprice").cast(DecimalType(12, 4)) *
            col("l_discount").cast(DecimalType(12, 4))), 4)
            .cast(DoubleType).as("revenue"))
      },
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
        |    CAST(l_discount AS DECIMAL(12,4))), 4) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01'
        |  AND l_shipdate < TIMESTAMP '1995-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),

    // --- broadcast join + conditional aggregate (TPC-H Q14 shape) --------
    // part is dimension-sized -> Catalyst broadcasts it under the fact
    // scan's date filter; the promo share is two exact DECIMAL sums
    // rounded to 4 dp, and ONE double division at the end (correctly
    // rounded over identical operands in both engines).
    "q14_promo_revenue" -> QueryDef(
      (s, d) => {
        val disc = col("l_extendedprice").cast(DecimalType(12, 4)) *
          (lit(BigDecimal(1)).cast(DecimalType(12, 4)) - col("l_discount").cast(DecimalType(12, 4)))
        lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1995-09-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1995-10-01").cast(TimestampType))
          .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
          .agg((lit(100.0) *
            round(sum(when(col("p_type") === "PROMO", disc).otherwise(lit(BigDecimal(0)).cast(DecimalType(25, 8)))), 4).cast(DoubleType) /
            round(sum(disc), 4).cast(DoubleType)).as("promo_share"))
      },
      """SELECT 100.0 * CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(12,4)) *
        |         (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))
        |    ELSE CAST(0 AS DECIMAL(25,8)) END), 4) AS DOUBLE) /
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
        |    (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE)
        |  AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-09-01'
        |  AND l_shipdate < TIMESTAMP '1995-10-01'""".stripMargin),

    // --- disjunctive join predicates (TPC-H Q19 shape) --------------------
    // OR-of-AND bands across both join sides: the Or conjunct stays a
    // residual (our simple-filter bridge is conjunct-only, fail-open) but
    // Catalyst still derives pushable per-side implications; the
    // aggregate follows the q1 decimal discipline. SQL runs verbatim on
    // both engines.
    "q19_disjunctive" -> QueryDef(
      (s, d) => {
        Tables.ensureView(s, d, "lineitem")(lineitem(s, d))
        Tables.ensureView(s, d, "part")(part(s, d))
        s.sql(q19Sql)
      },
      q19Sql),

    // --- scan + aggregate (TPC-H Q1 shape) -------------------------------
    "q1_pricing_summary" -> QueryDef(
      (s, d) => {
        val li = lineitem(s, d).filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        // DECIMAL(12,4) factors, NOT (18,4): the triple product's precision
        // must stay <= 38 on BOTH engines or the scales diverge — with
        // (18,4) factors Spark hits p=56 on charge and clamps the scale to
        // 6 (lossy per-row rounding) while DuckDB keeps s=12 exact, a
        // last-ulp sum_charge divergence that only SURFACES at sf0.1
        // totals (~2.8e9 needs >17 significant digits). (12,4)x(12,4) ->
        // (25,8), x(12,4) -> (38,12): exact end-to-end in both engines.
        val disc = (col("l_extendedprice").cast(DecimalType(12, 4)) *
          (lit(BigDecimal(1)).cast(DecimalType(12, 4)) - col("l_discount").cast(DecimalType(12, 4))))
        val charge = disc * (lit(BigDecimal(1)).cast(DecimalType(12, 4)) + col("l_tax").cast(DecimalType(12, 4)))
        li.groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            // round product sums to 4 dp BEFORE the double cast: DuckDB's
            // DECIMAL(38,8+)->DOUBLE cast double-rounds (hugeint ->
            // double, then /10^scale) and lands 1 ulp off the exact value
            // once totals pass ~17 significant digits (seen at sf0.1); at
            // scale 4 the numerator fits 2^53 and the single division is
            // correctly rounded in both engines. round(), not a DECIMAL
            // downscale cast: both engines round() half-away-from-zero,
            // but DuckDB TRUNCATES decimal->decimal scale reduction where
            // Spark rounds.
            round(sum(disc), 4).cast(DoubleType).as("sum_disc_price"),
            round(sum(charge), 4).cast(DoubleType).as("sum_charge"),
            (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
            (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order")
          )
          .orderBy("l_returnflag", "l_linestatus")
      },
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))), 4) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4))) * (CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4)))), 4) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(1) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(1) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(1) AS avg_disc,
        |  COUNT(1) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ),

    // --- 3-way join + agg + top-k (TPC-H Q3 shape) -----------------------
    "q3_shipping_priority" -> QueryDef(
      (s, d) => {
        val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = orders(s, d).filter(col("o_orderdate") < lit("1997-03-15").cast(TimestampType))
        val l = lineitem(s, d).filter(col("l_shipdate") > lit("1997-03-15").cast(TimestampType))
        val disc = (col("l_extendedprice").cast(DecimalType(18, 4)) *
          (lit(BigDecimal(1)).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4))))
        // no broadcast hint on customer: it scales with the corpus (unlike
        // nation/region), so the join strategy is left to the size
        // estimate + AQE — broadcast at bench scale, shuffle when a 100x
        // customer table would blow the 8 GB broadcast hard limit
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(round(sum(disc), 4).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin
    ),

    // --- 6-way join (TPC-H Q5 shape) -------------------------------------
    "q5_local_supplier_volume" -> QueryDef(
      (s, d) => {
        val disc = (col("l_extendedprice").cast(DecimalType(18, 4)) *
          (lit(BigDecimal(1)).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4))))
        lineitem(s, d)
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(supplier(s, d),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA"
            && col("o_orderdate") >= lit("1996-01-01").cast(TimestampType)
            && col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
          .groupBy("n_name")
          .agg(round(sum(disc), 4).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      """SELECT n_name,
        |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin
    ),

    // --- predicate coverage: = <> < <= > >= IN NOT IN (P1/P2) ------------
    "q_filter_predicates" -> QueryDef(
      (s, d) =>
        part(s, d)
          .filter(col("p_size").isin(5, 10, 15, 20)
            && col("p_brand") =!= "Brand#13"
            && !col("p_type").isin("PROMO", "ECONOMY")
            && col("p_retailprice") > 920.0
            && col("p_retailprice") <= 990.0
            && col("p_partkey") >= 100)
          .select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
          .orderBy("p_partkey"),
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part
        |WHERE p_size IN (5, 10, 15, 20)
        |  AND p_brand <> 'Brand#13'
        |  AND p_type NOT IN ('PROMO', 'ECONOMY')
        |  AND p_retailprice > 920.0
        |  AND p_retailprice <= 990.0
        |  AND p_partkey >= 100
        |ORDER BY p_partkey""".stripMargin
    ),

    // --- projection pushdown: 2 columns of a wide table (P4) --------------
    "q_projection" -> QueryDef(
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_linenumber")
          .orderBy("l_orderkey", "l_linenumber"),
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ),

    // --- sort + limit (O1/L1) ---------------------------------------------
    "q_sort_limit" -> QueryDef(
      (s, d) =>
        orders(s, d)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100),
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin
    ),

    // --- distinct ---------------------------------------------------------
    "q_distinct" -> QueryDef(
      (s, d) =>
        lineitem(s, d)
          .select("l_returnflag", "l_linestatus")
          .distinct()
          .orderBy("l_returnflag", "l_linestatus"),
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ),

    // --- set ops: EXCEPT / INTERSECT --------------------------------------
    "q_set_except" -> QueryDef(
      (s, d) =>
        customer(s, d).select(col("c_custkey").as("custkey"))
          .except(orders(s, d).filter(col("o_totalprice") > 300000.0)
            .select(col("o_custkey").as("custkey")))
          .orderBy("custkey"),
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000.0
        |ORDER BY custkey""".stripMargin
    ),
    "q_set_intersect" -> QueryDef(
      (s, d) =>
        customer(s, d).select(col("c_custkey").as("custkey"))
          .intersect(orders(s, d).select(col("o_custkey").as("custkey")))
          .orderBy("custkey"),
      """SELECT c_custkey AS custkey FROM customer
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin
    ),

    // --- window functions: row_number / lag / running sum ------------------
    "q_window_latest_events" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
        events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("user_id", "rn", "event_id", "event_type", "value")
          .orderBy("user_id", "rn")
      },
      """SELECT user_id, rn, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn <= 3
        |ORDER BY user_id, rn""".stripMargin
    ),
    "q_window_running_sum" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        events(s, d)
          .filter(col("user_id") < 10)
          .withColumn("running_value",
            sum(col("value").cast(DecimalType(18, 4))).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast(DoubleType))
          .select("user_id", "event_id", "running_value")
          .orderBy("user_id", "event_id")
      },
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events
        |WHERE user_id < 10
        |ORDER BY user_id, event_id""".stripMargin
    ),

    // --- correlated scalar subquery ----------------------------------------
    // Orders priced above TWICE their customer's average — the correlated
    // aggregate subquery shape. Catalyst de-correlates it into an
    // aggregate + equi-join (RewriteCorrelatedScalarSubquery), so the
    // executed plan is the same one-shuffle join a hand-written version
    // would get; the oracle keeps the correlated spelling.
    "q_scalar_subquery" -> QueryDef(
      (s, d) => {
        Tables.ensureView(s, d, "orders")(orders(s, d))
        s.sql(scalarSubquerySql)
      },
      scalarSubquerySql
    ),

    // --- event-time RANGE frame (trailing-window aggregates) ---------------
    // The sliding-aggregate shape (`how much did this user do in the hour
    // BEFORE each event`) as a RANGE frame over exact epoch-µs — a true
    // range join collapsed into one key-partitioned window, no self-join,
    // no explode. Peers at the same µs are in-frame together, so tie
    // order cannot change the result.
    "q_window_range_frame" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600L * 1000000L, 0)
        events(s, d)
          .filter(col("user_id") < 10)
          .withColumn("n_trailing_1h", count(lit(1)).over(w))
          .withColumn("sum_trailing_1h",
            sum(col("value").cast(DecimalType(18, 4))).over(w).cast(DoubleType))
          .select("user_id", "event_id", "n_trailing_1h", "sum_trailing_1h")
          .orderBy("user_id", "event_id")
      },
      """SELECT user_id, event_id,
        |  CAST(COUNT(1) OVER w AS BIGINT) AS n_trailing_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_trailing_1h
        |FROM events
        |WHERE user_id < 10
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin
    ),

    // --- semi / anti joins -------------------------------------------------
    "q_semi_join" -> QueryDef(
      (s, d) =>
        customer(s, d)
          .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers_with_orders"))
          .orderBy("c_mktsegment"),
      """SELECT c_mktsegment, COUNT(1) AS n_customers_with_orders
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin
    ),
    "q_anti_join" -> QueryDef(
      (s, d) =>
        customer(s, d)
          .join(orders(s, d).filter(col("o_totalprice") > 400000.0),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers_without_big_orders"))
          .orderBy("c_mktsegment"),
      """SELECT c_mktsegment, COUNT(1) AS n_customers_without_big_orders
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin
    ),

    // --- full outer join: both unmatched sides surface -----------------------
    // High-value customers vs big orders — each side keeps rows the other
    // lacks (customers with no big order, big orders from non-high-value
    // customers), the reconciliation shape two-source pipelines run.
    // COALESCE keys + null-side counts make both dangling directions
    // load-bearing in the hash.
    "q_full_outer_join" -> QueryDef(
      (s, d) => {
        val c = customer(s, d).filter(col("c_acctbal") > 9000.0)
          .select(col("c_custkey"), col("c_name"))
        val o = orders(s, d).filter(col("o_totalprice") > 400000.0)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big_orders"))
        c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("c_name"),
            coalesce(col("n_big_orders"), lit(0L)).as("n_big_orders"))
          .orderBy("custkey")
      },
      """WITH c AS (
        |  SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000.0
        |), o AS (
        |  SELECT o_custkey, COUNT(1) AS n_big_orders
        |  FROM orders WHERE o_totalprice > 400000.0 GROUP BY o_custkey
        |)
        |SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey, c.c_name,
        |  COALESCE(o.n_big_orders, 0) AS n_big_orders
        |FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
        |ORDER BY custkey""".stripMargin
    ),

    // --- time-bucketed aggregation over the event stream -------------------
    "q_events_hourly" -> QueryDef(
      (s, d) =>
        events(s, d)
          // timestamp_ntz matches DuckDB's naive date_trunc result (the repaired
          // events.ts is LTZ on the Spark side; the oracle compare is dtype-strict)
          .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
          .orderBy("hour", "event_type"),
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |  COUNT(1) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY CAST(date_trunc('hour', ts) AS TIMESTAMP), event_type
        |ORDER BY hour, event_type""".stripMargin
    ),

    // --- integer-exact hourly anomaly detection -----------------------------
    // Flags hours whose event count sits more than 2 population-σ from
    // the event type's hourly mean — WITHOUT any floating point: with
    // n hours, S = Σx and Q = Σx², the condition |x − S/n| > 2σ is
    // equivalent to the all-BIGINT inequality (n·x − S)² > 4(nQ − S²),
    // so the flagged set is bit-exact cross-engine (no mean/stddev
    // rounding to disagree on a boundary row). Scale shape: the hourly
    // rollup is a combinable (type, hour) aggregate; the per-type stats
    // relation is type-count-sized and broadcast back onto it.
    "events_anomaly" -> QueryDef(
      (s, d) => {
        // `hourly` feeds both the stats aggregate and the flag join;
        // materialized once (it is (type × hour)-sized) so the corpus
        // rollup pass doesn't execute twice (r15-opt plan audit)
        val hourly = graft.util.Materialize.once(events(s, d)
          .groupBy(col("event_type"),
            date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"))
          .agg(count(lit(1)).as("x")))
        val stats = hourly.groupBy("event_type")
          .agg(count(lit(1)).as("n_hours"), sum("x").as("sx"),
            sum(col("x") * col("x")).as("sq"))
        val dev = col("n_hours") * col("x") - col("sx")
        hourly.join(broadcast(stats), "event_type")
          .where(dev * dev > lit(4) * (col("n_hours") * col("sq") - col("sx") * col("sx")))
          .select(col("event_type"), col("hour"), col("x").as("n_events"), col("n_hours"))
          .orderBy("event_type", "hour")
      },
      """WITH hourly AS (
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
        |    COUNT(1) AS x
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT event_type, COUNT(1) AS n_hours, SUM(x) AS sx, SUM(x*x) AS sq
        |  FROM hourly GROUP BY 1)
        |SELECT h.event_type, h.hour, h.x AS n_events, s.n_hours
        |FROM hourly h JOIN stats s USING (event_type)
        |WHERE (s.n_hours*h.x - s.sx)*(s.n_hours*h.x - s.sx)
        |      > 4*(s.n_hours*s.sq - s.sx*s.sx)
        |ORDER BY h.event_type, h.hour""".stripMargin
    ),

    // --- salted join for skewed keys ---------------------------------------
    // The same enrich-and-aggregate a plain join would compute, executed
    // through operators/SkewJoin: per-row salt on the fact side, dim
    // replicated 8 ways, join on (user_id, salt) — a hot user's events
    // spread over 8 tasks instead of one straggler. The oracle is the
    // UNSALTED join: identical output is the point.
    "q_skew_salted_join" -> QueryDef(
      (s, d) => {
        val ev = events(s, d)
        val dim = ev.groupBy("user_id").agg(min(col("ts")).as("first_ts"))
        graft.operators.SkewJoin.saltedInner(ev, dim, "user_id", salts = 8)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_events"),
            count(when(col("ts") >= col("first_ts") + expr("INTERVAL 7 DAYS"), 1)).as("n_mature"),
            dsum(col("value")).as("total_value"))
          .orderBy("event_type")
      },
      """WITH dim AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id)
        |SELECT e.event_type, COUNT(1) AS n_events,
        |  COUNT(CASE WHEN e.ts >= d.first_ts + INTERVAL 7 DAY THEN 1 END) AS n_mature,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |GROUP BY e.event_type
        |ORDER BY e.event_type""".stripMargin
    ),

    // --- dimension-join rollup ---------------------------------------------
    // part scales with SF, so the broadcast decision belongs to the size
    // estimate + AQE (which picks broadcast at bench scale) — a forced
    // hint would hard-fail at the 8 GB broadcast limit on a 100x dim
    "q_join_part_rollup" -> QueryDef(
      (s, d) =>
        lineitem(s, d)
          .join(part(s, d), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n_lines"))
          .orderBy("p_brand"),
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(1) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin
    ),

    // --- scalar/global aggregates incl. exact distinct ----------------------
    "q_global_stats" -> QueryDef(
      (s, d) =>
        lineitem(s, d).agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          min(col("l_shipdate")).as("min_shipdate"),
          max(col("l_shipdate")).as("max_shipdate"),
          dsum(col("l_quantity")).as("sum_qty")),
      """SELECT COUNT(1) AS n_rows,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  MIN(l_shipdate) AS min_shipdate,
        |  MAX(l_shipdate) AS max_shipdate,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem""".stripMargin
    ),

    // --- grouped top-k (purchases per user) ---------------------------------
    "q_top_purchasers" -> QueryDef(
      (s, d) =>
        events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(dsum(col("value")).as("total_spend"), count(lit(1)).as("n_purchases"))
          .orderBy(col("total_spend").desc, col("user_id"))
          .limit(20),
      """SELECT user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_spend,
        |  COUNT(1) AS n_purchases
        |FROM events
        |WHERE event_type = 'purchase'
        |GROUP BY user_id
        |ORDER BY total_spend DESC, user_id
        |LIMIT 20""".stripMargin
    ),

    // --- ROLLUP / CUBE grouping sets (Catalyst Expand operator) ------------
    // Subtotal + grand-total rows in one pass: Expand replicates each input
    // row per grouping set before the hash-agg, so either lattice is still
    // a single shuffle (map-side combinable) — the right shape for
    // hierarchical rollups at scale. One builder serves both so the
    // grouping-flag total-order discipline cannot diverge: NULLS FIRST
    // pins the cross-engine sort order (DuckDB defaults NULLS LAST), and
    // g_flag/g_status in the sort keep it total even if the grouping
    // columns ever contain real NULLs (a data NULL group and a subtotal
    // row would otherwise tie and hash-compare flaky).
    "q_rollup" -> groupingLattice(_.rollup("l_returnflag", "l_linestatus"), "ROLLUP"),
    "q_cube" -> groupingLattice(_.cube("l_returnflag", "l_linestatus"), "CUBE"),
    // explicit GROUPING SETS (a strict subset of the cube — per-flag,
    // per-status, grand total — exercising the analyzer's direct sets
    // path rather than the rollup/cube expansions); the SQL runs
    // verbatim on BOTH engines through the shared lattice shape
    "q_grouping_sets" -> QueryDef(
      (s, d) => {
        Tables.ensureView(s, d, "lineitem")(lineitem(s, d))
        s.sql(
          """SELECT l_returnflag, l_linestatus,
            |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
            |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
            |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
            |  COUNT(1) AS n_rows
            |FROM lineitem
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST,
            |  g_flag, g_status""".stripMargin)
      },
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(1) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST,
        |  g_flag, g_status""".stripMargin),

    // --- PIVOT (wide conditional aggregation) -----------------------------
    // `pivot` with an EXPLICIT value list compiles to ONE hash aggregate
    // over the group key (no values-discovery job, no extra shuffle) —
    // the same single-pass shape as the FILTER-clause oracle. Empty cells
    // surface as NULL from PivotFirst; COALESCE pins them to the oracle's
    // zero counts.
    "q_pivot" -> QueryDef(
      (s, d) =>
        orders(s, d)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("O", "F", "P"))
          .agg(count(lit(1)))
          .select(col("o_orderpriority"),
            coalesce(col("O"), lit(0L)).as("n_open"),
            coalesce(col("F"), lit(0L)).as("n_finished"),
            coalesce(col("P"), lit(0L)).as("n_pending"))
          .orderBy("o_orderpriority"),
      """SELECT o_orderpriority,
        |  CAST(COUNT(1) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
        |  CAST(COUNT(1) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
        |  CAST(COUNT(1) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_pending
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    ),

    // --- exact discrete percentiles ---------------------------------------
    // p50/p95 as ACTUAL data values (nearest-rank): rank each group once,
    // pick the ceil(q*n)-th value — no interpolation arithmetic, so the
    // result is a raw input value and hash-stable across engines (a
    // `percentile_cont` formulation would compare interpolated doubles
    // whose last ulp depends on each engine's operation order). The
    // per-group sort IS the cost of exactness: this is the exactness
    // baseline (like embed_knn_brute); the 100 TB path is
    // approx_percentile's mergeable sketch, traded off per use.
    "q_percentile_disc" -> QueryDef(
      (s, d) => {
        val byFlag = Window.partitionBy("l_returnflag")
        val ranked = lineitem(s, d).select(
          col("l_returnflag"), col("l_extendedprice").as("v"),
          row_number().over(byFlag.orderBy("l_extendedprice")).as("rn"),
          count(lit(1)).over(byFlag).as("n"))
        ranked.groupBy("l_returnflag")
          .agg(
            max(when(col("rn") === ceil(lit(0.5) * col("n")).cast(LongType), col("v"))).as("p50"),
            max(when(col("rn") === ceil(lit(0.95) * col("n")).cast(LongType), col("v"))).as("p95"),
            count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag")
      },
      """WITH ranked AS (
        |  SELECT l_returnflag, l_extendedprice AS v,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
        |    COUNT(1) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS p50,
        |  MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN v END) AS p95,
        |  CAST(COUNT(1) AS BIGINT) AS n_rows
        |FROM ranked
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    )
  )

  def queries: Map[String, QueryDef] = qs
}
