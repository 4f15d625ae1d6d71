package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for operator-internal persists, so a long-lived session can
  * release them after each query instead of pinning blocks forever.
  *
  * Operators that materialize an intermediate consumed more than once
  * (MinHash signatures feeding both sides of a band self-join, an inverted
  * index feeding three aggregates) must persist it, or Spark recomputes the
  * whole upstream once per consumer. But a bare `.persist()` inside an
  * operator has no release path: the caller only sees the final DataFrame,
  * and a many-query session accumulates pinned MEMORY_AND_DISK blocks
  * without bound. Worse, Spark's CacheManager plan-matches NEW queries
  * against the stale entries, so two queries that build the same signature
  * sub-plan trip "already cached" reuse of an entry whose blocks another
  * operator may have meanwhile dropped.
  *
  * The contract: operators persist through [[persist]]; whoever owns the
  * query (Verify, Bench, a test suite, a user's driver program) calls
  * [[drain]] once the query's terminal action has consumed the result.
  * Draining between queries keeps the CacheManager empty across query
  * boundaries — exactly the isolation a long-lived cluster session needs.
  * (At warehouse scale the same role is played by writing the intermediate
  * to parquet once; this registry is the in-session twin.)
  *
  * Registrations are scoped PER THREAD: a query is built and drained on one
  * thread (the normal Spark driver pattern — one thread per concurrent
  * query), and [[drain]] releases only the calling thread's registrations.
  * Concurrent query threads therefore cannot release each other's in-flight
  * persists — which matters most for [[onDrain]] cleanups (checkpoint
  * releases), whose results are NOT recompute-safe. A thread that exits
  * without draining leaks its scope until [[drainAll]]; call that once at
  * session shutdown.
  */
object CacheScope {
  private final class Scope {
    val live = new java.util.ArrayDeque[DataFrame]()
    val cleanups = new java.util.ArrayDeque[() => Unit]()
  }
  private val scopes = new java.util.concurrent.ConcurrentHashMap[Long, Scope]()

  private def current(): Scope =
    scopes.computeIfAbsent(Thread.currentThread().getId, _ => new Scope)

  /** Persist `df` and register it for the calling thread's next [[drain]]. */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    current().live.add(p)
    p
  }

  /** Register an arbitrary release thunk for the calling thread's next
    * [[drain]] — for storage a plain `DataFrame.unpersist` can't free
    * (localCheckpoint blocks, which bypass the CacheManager). A
    * checkpoint-backed result is INVALID after its cleanup runs (lineage is
    * truncated, it cannot recompute), so the owning thread must be
    * completely done with query results before draining. */
  def onDrain(f: () => Unit): Unit = current().cleanups.add(f)

  private def release(s: Scope): Unit = {
    var df = s.live.poll()
    // blocking: the drain happens BETWEEN queries (session hygiene, outside
    // any timed region), and an async unpersist leaks its block-removal work
    // into the NEXT query's execution — under load the async cleanup thread
    // falls behind and storage memory fills with dead blocks exactly when
    // the next operator needs it
    while (df != null) { df.unpersist(blocking = true); df = s.live.poll() }
    var f = s.cleanups.poll()
    while (f != null) { f(); f = s.cleanups.poll() }
  }

  /** Unpersist every frame registered by the CALLING thread (blocking),
    * run its registered cleanups, and empty its scope. Call after the
    * terminal action of the query that caused the persists. A plain-persisted
    * result consumed later recomputes (correct, just uncached); a
    * checkpoint-backed one is gone — see [[onDrain]]. Other threads'
    * registrations are untouched. */
  def drain(): Unit = {
    val s = scopes.remove(Thread.currentThread().getId)
    if (s != null) release(s)
  }

  /** Release EVERY thread's registrations — session-shutdown sweep for
    * scopes leaked by threads that exited without draining. Only safe when
    * no query is in flight on any thread. */
  def drainAll(): Unit = {
    val it = scopes.keySet().iterator()
    while (it.hasNext) {
      val s = scopes.remove(it.next())
      if (s != null) release(s)
    }
  }

  /** Calling thread's registered-but-not-yet-drained count (test hook). */
  def pending: Int = {
    val s = scopes.get(Thread.currentThread().getId)
    if (s == null) 0 else s.live.size() + s.cleanups.size()
  }
}
