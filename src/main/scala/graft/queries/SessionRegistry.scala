package graft.queries

import org.apache.spark.sql.SparkSession

/** Per-session state registry shared by the view/prep caches.
  *
  * Keys WEAKLY on the SparkSession itself (not its identity hash): entries
  * of stopped-and-collected sessions become unreachable and are reclaimed
  * by the GC, and — unlike an identityHashCode key in a global map — a new
  * session can never collide with a dead one's hash and inherit stale
  * "already registered / already persisted" state.
  */
private[queries] object SessionRegistry {
  private val perSession =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, Any]]()

  /** The (thread-safe) registry for one session. */
  def of(s: SparkSession): scala.collection.concurrent.TrieMap[String, Any] =
    perSession.synchronized {
      var m = perSession.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, Any]
        perSession.put(s, m)
      }
      m
    }
}
