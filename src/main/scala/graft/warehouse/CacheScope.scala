package graft.warehouse

import org.apache.spark.sql.DataFrame

/** Cache-lifecycle handle for the warehouse engine.
  *
  * The SCD merge and the star build persist intermediates that are read by
  * several plan branches ([[Scd.merge]], [[SurrogateKeys.assign]],
  * [[Ffill.forwardFill]], the per-dim caches in
  * [[graft.ibrd.IbrdWarehouse]]). In a one-shot query those caches die with
  * the session; in the reference's production shape — an hourly batch/
  * streaming loop (`pyspark_dag2.py:447-448`) — they would accumulate
  * storage blocks batch-over-batch forever. A `CacheScope` makes ownership
  * explicit: the engine registers every internal persist against the scope
  * the caller passed, and the caller releases the scope once the batch's
  * output is materialized (e.g. after
  * [[graft.ibrd.IbrdWarehouse.persist]]).
  *
  * {{{
  * val scope = new CacheScope
  * val next  = IbrdWarehouse.incremental(prev, staged, asOf, scope)
  * IbrdWarehouse.persist(next, sink)   // materializes every table
  * scope.release()                     // storage blocks back to baseline
  * }}}
  *
  * Releasing before materialization is safe (readers recompute) but forfeits
  * the cache benefit. (The total-order machines — [[SurrogateKeys.assign]],
  * [[Ffill]], the fact key exchange — pin their bucket bounds via
  * [[RangeBuckets]], so none of them needs a persist as a determinism
  * guard.)
  */
final class CacheScope private (track: Boolean) {
  def this() = this(true)

  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK) and register it for [[release]]. */
  def persist(df: DataFrame): DataFrame = {
    if (track) synchronized { tracked += df }
    df.persist()
  }

  /** Unpersist every tracked DataFrame (non-blocking: the catalog entry is
    * dropped synchronously; block deletion proceeds in the background). */
  def release(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }

  /** Number of currently tracked (un-released) cached frames. */
  def trackedCount: Int = synchronized(tracked.size)
}

object CacheScope {
  /** Persists without tracking — the one-shot/interactive convenience used
    * by default parameters. Loops (streaming warehouse, repeated merges)
    * must pass an owned `new CacheScope` and release it per batch. */
  val untracked: CacheScope = new CacheScope(false)
}
