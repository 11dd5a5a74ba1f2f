package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/** The `hudi_query` table-valued function — Spark-Hudi's SQL surface for
  * mode-selected reads (its `HoodieQuery` TVF), re-expressed over this
  * engine's DSv2 relation so upstream SQL ports verbatim:
  *
  * {{{
  * -- upstream Spark-Hudi's signature:
  * SELECT * FROM hudi_query('/path/to/table', 'snapshot');
  * SELECT * FROM hudi_query('/path/to/table', 'read_optimized');
  * -- engine extension: optional third as-of timestamp (time travel)
  * SELECT * FROM hudi_query('/path', 'snapshot', '20240101000000000');
  * }}}
  *
  *  - `snapshot`: the merged latest view (MOR log merge included);
  *  - `read_optimized`: base-files-only (M6) — upstream's second mode;
  *  - the optional third argument pins the snapshot `as.of.timestamp`
  *    (engine extension; upstream spells time travel in the FROM clause
  *    instead, which the catalog path already supports via
  *    `FOR TIMESTAMP AS OF`). `read_optimized` composes with it (the
  *    as-of plan's base files only).
  *
  * The expansion IS the option-based DSv2 relation — same pushdown,
  * pruning, index tiers, and aggregate-pushdown planning as
  * `spark.read.format("hudi-graft").load(path)`; nothing
  * driver-materialized (the `hudi_sql_query_ro` oracle entry pins
  * equality with the option-based read-optimized scan). Arguments must
  * be literals: the table path decides the plan's schema, which
  * analysis needs before execution. An unknown mode THROWS (a typo'd
  * `'read_optimised'` silently falling back to snapshot would change
  * which rows a MOR query returns).
  */
object HudiQuery {

  val name = "hudi_query"

  private def stringArg(e: Expression, pos: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case _ => throw new IllegalArgumentException(
      s"$name: $pos must be a string literal, got $e")
  }

  def builder(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length >= 2 && exprs.length <= 3,
      s"$name takes (path, 'snapshot'|'read_optimized'[, as_of]) — got " +
        s"${exprs.length} arguments")
    val path = stringArg(exprs.head, "path")
    val mode = stringArg(exprs(1), "query type").toLowerCase
    val readOptimized = mode match {
      case "snapshot" => false
      case "read_optimized" => true
      case other => throw new IllegalArgumentException(
        s"$name: unknown query type '$other' — expected 'snapshot' or " +
          "'read_optimized'")
    }
    val asOf = if (exprs.length == 3) Some(stringArg(exprs(2), "as_of")) else None
    var reader = SparkSession.active.read.format("hudi-graft")
    if (readOptimized) reader = reader.option("read.optimized", "true")
    asOf.foreach(ts => reader = reader.option("as.of.timestamp", ts))
    reader.load(path).queryExecution.logical
  }

  val info = new ExpressionInfo(HudiQuery.getClass.getName, name)

  /** Per-session registration for sessions built without
    * `spark.sql.extensions=graft.functions.GraftExtensions`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder _)
}
