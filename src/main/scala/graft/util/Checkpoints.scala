package graft.util

import org.apache.spark.sql.DataFrame

/** Lifecycle helper for iterative DataFrame loops built on
  * `localCheckpoint()` (connected components, PageRank).
  */
object Checkpoints {

  /** Free the blocks behind a `localCheckpoint()`ed frame: Dataset
    * .unpersist goes through the SQL CacheManager and never touches the
    * checkpoint's underlying RDD persist, so superseded generations
    * would otherwise pile up in the block store for the whole loop (the
    * ContextCleaner only reclaims them after GC). No-op on frames that
    * are not checkpoint scans.
    */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
