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
  * session (Verify, Bench, a test suite, a user's driver program) calls
  * [[drain]] once the query's terminal action has consumed the result.
  * Draining between queries keeps the CacheManager empty across query
  * boundaries — exactly the isolation a long-lived cluster session needs.
  * (At warehouse scale the same role is played by writing the intermediate
  * to parquet once; this registry is the in-session twin.)
  */
object CacheScope {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val cleanups = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Persist `df` and register it for the next [[drain]]. */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    live.add(p)
    p
  }

  /** Register an arbitrary release thunk for the next [[drain]] — for
    * storage a plain `DataFrame.unpersist` can't free (localCheckpoint
    * blocks, which bypass the CacheManager). A checkpoint-backed result is
    * INVALID after its cleanup runs (lineage is truncated, it cannot
    * recompute), so owners must be completely done with query results
    * before draining. */
  def onDrain(f: () => Unit): Unit = cleanups.add(f)

  /** Unpersist every registered frame (non-blocking), run every registered
    * cleanup, and empty the registry. Call after the terminal action of the
    * query that caused the persists. A plain-persisted result consumed
    * later recomputes (correct, just uncached); a checkpoint-backed one is
    * gone — see [[onDrain]]. */
  def drain(): Unit = {
    var df = live.poll()
    while (df != null) { df.unpersist(blocking = false); df = live.poll() }
    var f = cleanups.poll()
    while (f != null) { f(); f = cleanups.poll() }
  }

  /** Registered-but-not-yet-drained count (test / monitoring hook). */
  def pending: Int = live.size() + cleanups.size()
}
