package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{BooleanType, StringType}

/** The `hudi_table_changes` table-valued function — the SQL surface for
  * batch incremental reads (S3), mirroring Spark-Hudi's TVF of the same
  * name over this engine's DSv2 incremental machinery. BOTH positional
  * signatures are accepted:
  *
  * {{{
  * -- upstream Spark-Hudi's signature (portable verbatim):
  * SELECT * FROM hudi_table_changes('/path', 'latest_state', '<start>');
  * SELECT * FROM hudi_table_changes('/path', 'cdc', 'earliest', '<end>');
  * -- the engine's extended form:
  * SELECT * FROM hudi_table_changes('/path/to/table', '<start>');
  * SELECT * FROM hudi_table_changes('/path', '<start>', '<end>');
  * SELECT * FROM hudi_table_changes('/path', 'earliest', '<end>', true);
  * }}}
  *
  *  - a SECOND argument of `'latest_state'` or `'cdc'` is upstream's
  *    required changeType (start/end shift right one slot):
  *    `latest_state` is the plain incremental feed; `'cdc'` returns
  *    upstream's CDC schema — `(op, ts_ms, before, after)` image rows,
  *    inferred per commit by file-group diffs (see [[CdcRead]]; a range
  *    containing a non-clustering replacecommit throws rather than emit
  *    an incomplete feed). Both mode strings shift start/end right —
  *    they are unambiguous because neither parses as a commit timestamp;
  *  - `start`: exclusive start commit, or `'earliest'` for the full
  *    history (Hudi's sentinel);
  *  - `end` (optional): inclusive end commit, default latest;
  *  - the extended form's optional boolean enables delete tombstones
  *    (rows whose data columns are null with meta columns populated —
  *    the `stream.emit.deletes` option) without the `cdc` keyword.
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
      s"$name takes (path, 'latest_state'|'cdc', start[, end]) or " +
        s"(path, start[, end][, emit_deletes]) — got ${exprs.length} arguments")
    val path = stringArg(exprs.head, "path")
    // upstream dispatch: Spark-Hudi's TVF is (table, changeType, startTs
    // [, endTs]) with changeType mandatory — a query ported verbatim
    // binds 'latest_state'/'cdc' into slot 2, which must select the mode
    // and SHIFT start/end right, not parse as a timestamp
    val arg1 = stringArg(exprs(1), "start")
    val mode = arg1.toLowerCase match {
      case "latest_state" | "cdc" => Some(arg1.toLowerCase)
      case _ => None
    }
    // positional, strictly typed: a mistyped argument must THROW, not be
    // silently dropped (an unquoted numeric end commit falling through
    // would quietly extend the read to the latest instant; a string
    // 'true' for emit_deletes would quietly drop the tombstones)
    def boolArg(e: Expression): Boolean = e match {
      case Literal(v: java.lang.Boolean, BooleanType) => v.booleanValue()
      case _ => throw new IllegalArgumentException(
        s"$name: emit_deletes must be a boolean literal, got $e")
    }
    val (start, end, emitDeletes) = mode match {
      case Some("cdc") =>
        // upstream's CDC format: (op, ts_ms, before, after) image rows,
        // inferred per commit by file-group diffs (see [[CdcRead]])
        require(exprs.length >= 3,
          s"$name('cdc', ...) requires a start timestamp (Hudi's positional signature)")
        val cs = stringArg(exprs(2), "start")
        val ce = if (exprs.length >= 4) Some(stringArg(exprs(3), "end")) else None
        return CdcRead.changes(SparkSession.active, path,
          if (cs.equalsIgnoreCase("earliest")) None else Some(cs), ce)
          .queryExecution.logical
      case Some(m) =>
        require(exprs.length >= 3,
          s"$name('$m', ...) requires a start timestamp (Hudi's positional signature)")
        val s = stringArg(exprs(2), "start")
        val e = if (exprs.length >= 4) Some(stringArg(exprs(3), "end")) else None
        (s, e, false)
      case None =>
        val rest = exprs.drop(2)
        rest match {
          case Seq() => (arg1, None, false)
          case Seq(Literal(_, BooleanType)) => (arg1, None, boolArg(rest.head))
          case Seq(e) => (arg1, Some(stringArg(e, "end")), false)
          case Seq(e, d) => (arg1, Some(stringArg(e, "end")), boolArg(d))
        }
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
