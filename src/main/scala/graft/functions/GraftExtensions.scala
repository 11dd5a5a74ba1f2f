package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point registering graft's native
  * expressions for every session:
  *
  * {{{
  * spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * The per-session `register` helpers on each expression object remain for
  * programmatic use when the extension isn't configured.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_dot takes exactly 2 arguments")
        LongArrayDot(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleSet].getName, "graft_shingles"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_shingles takes exactly 2 arguments")
        ShingleSet(exprs.head, exprs(1))
      }))
    ext.injectTableFunction((
      FunctionIdentifier(graft.sources.HudiTableChanges.name),
      graft.sources.HudiTableChanges.info,
      graft.sources.HudiTableChanges.builder _))
    ext.injectTableFunction((
      FunctionIdentifier(graft.sources.HudiQuery.name),
      graft.sources.HudiQuery.info,
      graft.sources.HudiQuery.builder _))
  }
}
