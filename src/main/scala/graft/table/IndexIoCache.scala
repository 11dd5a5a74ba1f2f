package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import java.util.concurrent.atomic.AtomicLong

/** Bounded LRU byte cache for METADATA-TABLE file reads on the planning
  * path (index HFile bases, HFile log blocks' containing log files).
  *
  * Why it is sound: MDT file names embed the writing instant and write
  * token, so a path's CONTENT is immutable — a cache entry can never go
  * stale, and invalidation-on-commit-advance is structural: a new MDT
  * commit materializes NEW paths, which miss the cache and read fresh,
  * while the superseded paths age out of the LRU. (Data-table reads
  * never come through here — executor-side log/base scan IO keeps its
  * own memory profile.)
  *
  * Why it matters: every planning pass (secondary-index probe, record-
  * key point tier, bloom tier, column_stats load, files-partition
  * listing) re-opened the same MDT HFiles — a repeat point query on the
  * same table paid the full byte fetch per plan. At 100 TB planning QPS
  * that is an object-store round-trip per index file per query; with
  * the cache, a repeat plan performs ZERO index byte reads
  * (`IndexIoCacheSpec` pins this against [[reads]]).
  *
  * Thread-safe: the LRU map is guarded by a monitor; the byte fetch of
  * a miss happens OUTSIDE the lock so concurrent planning threads never
  * serialize on IO (a racing duplicate fetch of the same path is
  * benign — last insert wins, counted once per actual read).
  */
object IndexIoCache {

  /** Underlying (cache-miss) file reads — monotonic, for tests. */
  val reads = new AtomicLong(0L)

  /** Cache hits — monotonic, for tests. */
  val hits = new AtomicLong(0L)

  /** Total cached bytes cap; overridable for eviction tests. */
  private def maxBytes: Long =
    sys.props.get("graft.index.io.cache.max.bytes").flatMap(_.toLongOption)
      .getOrElse(256L << 20)

  private val lru = new java.util.LinkedHashMap[String, Array[Byte]](64, 0.75f, true)
  private var totalBytes = 0L

  def bytes(path: Path, conf: Configuration): Array[Byte] = {
    // MDT base HFiles and v8+ log files are content-immutable at a path,
    // but a 0.x MDT writer APPENDS log blocks to an existing file path
    // across deltacommits (the name carries the base instant, not the
    // writing commit) — keying on the path alone would serve pre-append
    // bytes to the files/column_stats/secondary-index readers and
    // silently lose newly committed records. Key on (path, len, mtime):
    // one getFileStatus per access (a cheap metadata RPC, not a data
    // read) makes any in-place change a natural miss.
    val st = path.getFileSystem(conf).getFileStatus(path)
    val key = s"${path.toString}#${st.getLen}#${st.getModificationTime}"
    val cached = lru.synchronized(Option(lru.get(key)))
    cached match {
      case Some(b) => hits.incrementAndGet(); b
      case None =>
        reads.incrementAndGet()
        val b = graft.util.ReadFully(path, conf)
        lru.synchronized {
          val prev = lru.put(key, b)
          totalBytes += b.length - Option(prev).map(_.length.toLong).getOrElse(0L)
          val it = lru.entrySet().iterator()
          while (totalBytes > maxBytes && it.hasNext) {
            val eldest = it.next()
            totalBytes -= eldest.getValue.length
            it.remove()
          }
        }
        b
    }
  }

  /** Test hook: drop everything (counters keep running). */
  def clear(): Unit = lru.synchronized { lru.clear(); totalBytes = 0L }

  /** Current cached byte total (tests). */
  def cachedBytes: Long = lru.synchronized(totalBytes)
}

/** Count-bounded, access-ordered memo for planning verdicts keyed by
  * immutable facts (an MDT commit, a file's (mtime, len)) — the
  * ColumnStatsIndex.lookupMemo pattern, shared so the smaller verdict
  * caches can't accumulate one entry per historical commit on a
  * long-lived driver.
  */
final class BoundedMemo[K, V](maxEntries: Int) {
  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size > maxEntries
  }
  def get(k: K): Option[V] = m.synchronized(Option(m.get(k)))
  def put(k: K, v: V): Unit = m.synchronized { m.put(k, v); () }
}
