package graft.queries

import org.apache.spark.sql.SparkSession

/** Per-session state registry shared by the view/prep caches.
  *
  * Keys WEAKLY on the SparkSession itself (not its identity hash): unlike
  * an identityHashCode key in a global map, a new session can never
  * collide with a dead one's hash and inherit stale "already registered /
  * already persisted" state.
  *
  * Weak keying alone does NOT reclaim dead sessions here — the cached
  * values (DataFrames) strongly reference their SparkSession, and a
  * WeakHashMap entry whose value reaches its own key is never collected.
  * So `of` additionally SWEEPS entries whose context is stopped, clearing
  * their TrieMaps (dropping the DataFrame→session strong chain) so the
  * weak entry becomes collectable: any later access from any session
  * evicts every dead session's state.
  */
private[graft] object SessionRegistry {
  private val perSession =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, Any]]()

  /** The (thread-safe) registry for one session. */
  def of(s: SparkSession): scala.collection.concurrent.TrieMap[String, Any] =
    perSession.synchronized {
      val it = perSession.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val sess = e.getKey
        if (sess != null && sess.sparkContext.isStopped && !(sess eq s)) {
          e.getValue.clear()
          it.remove()
        }
      }
      var m = perSession.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, Any]
        perSession.put(s, m)
      }
      m
    }
}
