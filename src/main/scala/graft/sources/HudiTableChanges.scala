package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{BooleanType, StringType}

/** The `hudi_table_changes` table-valued function — the SQL surface for
  * batch incremental reads (S3), mirroring Spark-Hudi's TVF of the same
  * name over this engine's DSv2 incremental machinery:
  *
  * {{{
  * SELECT * FROM hudi_table_changes('/path/to/table', '<start>');
  * SELECT * FROM hudi_table_changes('/path', '<start>', '<end>');
  * SELECT * FROM hudi_table_changes('/path', 'earliest', '<end>', true);
  * }}}
  *
  *  - `start`: exclusive start commit, or `'earliest'` for the full
  *    history (Hudi's sentinel);
  *  - `end` (optional): inclusive end commit, default latest;
  *  - the optional boolean enables delete tombstones (rows whose data
  *    columns are null with meta columns populated — the
  *    `stream.emit.deletes` option), the changes-with-deletes CDC feed.
  *
  * The expansion IS the option-based DSv2 incremental relation — one
  * `DataSourceV2Relation` with the same pushdown/planning path, nothing
  * driver-materialized — so the TVF result is definitionally equal to
  * `spark.read.option("query.type","incremental")...load(path)` on the
  * same range (the `hudi_sql_table_changes` oracle entry pins that).
  * Arguments must be literals: the table path decides the plan's schema,
  * which analysis needs before execution.
  */
object HudiTableChanges {

  val name = "hudi_table_changes"

  private def stringArg(e: Expression, pos: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case _ => throw new IllegalArgumentException(
      s"$name: $pos must be a string literal, got $e")
  }

  def builder(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length >= 2 && exprs.length <= 4,
      s"$name takes (path, start[, end][, emit_deletes]) — got ${exprs.length} arguments")
    val path = stringArg(exprs.head, "path")
    val start = stringArg(exprs(1), "start")
    // positional, strictly typed: a mistyped argument must THROW, not be
    // silently dropped (an unquoted numeric end commit falling through
    // would quietly extend the read to the latest instant; a string
    // 'true' for emit_deletes would quietly drop the tombstones)
    val rest = exprs.drop(2)
    def boolArg(e: Expression): Boolean = e match {
      case Literal(v: java.lang.Boolean, BooleanType) => v.booleanValue()
      case _ => throw new IllegalArgumentException(
        s"$name: emit_deletes must be a boolean literal, got $e")
    }
    val (end, emitDeletes) = rest match {
      case Seq() => (None, false)
      case Seq(Literal(_, BooleanType)) => (None, boolArg(rest.head))
      case Seq(e) => (Some(stringArg(e, "end")), false)
      case Seq(e, d) => (Some(stringArg(e, "end")), boolArg(d))
    }
    var reader = SparkSession.active.read
      .format("hudi-graft")
      .option("query.type", "incremental")
    // Hudi's 'earliest' sentinel = no lower bound (full history)
    if (!start.equalsIgnoreCase("earliest")) reader = reader.option("start.timestamp", start)
    end.foreach(e => reader = reader.option("end.timestamp", e))
    if (emitDeletes) reader = reader.option("stream.emit.deletes", "true")
    reader.load(path).queryExecution.logical
  }

  val info = new ExpressionInfo(HudiTableChanges.getClass.getName, name)

  /** Per-session registration for sessions built without
    * `spark.sql.extensions=graft.functions.GraftExtensions`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder _)
}
