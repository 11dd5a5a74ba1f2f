package graft.util

import java.util.concurrent.{Callable, Executors, TimeUnit}
import scala.jdk.CollectionConverters._

/** Bounded-parallelism map for driver-side planning I/O (footer reads,
  * directory listings) — the Spark analog of the reference's
  * `hoodie.plan.listing.parallelism` knob and its concurrent fs-view
  * pruning. Planning touches one small ranged read per file; on an object
  * store those are latency-bound, so issuing them concurrently turns
  * O(files) round-trips into O(files / parallelism).
  */
object Parallel {

  /** Map `f` over `items` on a fixed pool; preserves order, propagates the
    * first failure. Runs inline for trivial inputs.
    */
  def map[A, B](items: Seq[A], parallelism: Int)(f: A => B): Vector[B] = {
    if (items.isEmpty) return Vector.empty
    val n = math.min(math.max(parallelism, 1), items.size)
    if (n <= 1 || items.size == 1) return items.iterator.map(f).toVector
    val pool = Executors.newFixedThreadPool(n)
    try {
      val tasks = items.map(a => new Callable[B] { override def call(): B = f(a) }).asJava
      // unwrap ExecutionException so callers see the task's own exception
      // type in BOTH the pooled and inline paths (the documented contract)
      pool.invokeAll(tasks).asScala.iterator.map { fut =>
        try fut.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }.toVector
    } finally {
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.MINUTES)
    }
  }
}
