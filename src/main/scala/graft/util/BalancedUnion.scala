package graft.util

import org.apache.spark.sql.DataFrame

/** Union a sequence of DataFrames as a BALANCED binary tree instead of the
  * left-deep chain `reduce(_ unionByName _)` builds. Both shapes hold the
  * same n leaves, but the chain's depth is n — a 1000-commit CDC range
  * would hand the analyzer (and every down-tree transform, each of which
  * recurses by depth) a 1000-deep plan and risk a driver stack overflow —
  * while the balanced tree's depth is ceil(log2 n): 200 leaves → depth 8,
  * 4096 → 12. Catalyst flattens adjacent Unions into one n-ary node during
  * optimization either way, so the EXECUTED plan is identical; this bounds
  * the pre-optimization tree the driver must walk.
  */
object BalancedUnion {

  def apply(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "BalancedUnion of zero frames")
    var level = dfs.toIndexedSeq
    while (level.size > 1)
      level = level.grouped(2).map { g =>
        if (g.size == 1) g.head else g(0).unionByName(g(1))
      }.toIndexedSeq
    level.head
  }
}
