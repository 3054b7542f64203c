package graft.engine

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-wide registry for operator-internal caches, closing the
  * persist lifecycle the DataFrame API leaves open.
  *
  * Operators that persist reused intermediates (the dedup candidate
  * indexes, prefix-sum partials, SRP signature base) hand their caches
  * to the RETURNED lazy DataFrame's lineage — there is no in-operator
  * point "after the last action" at which to unpersist, because the
  * action belongs to the caller. Left alone, a long-lived session (the
  * 92-query bench, a notebook, a server) accumulates every dead cache
  * in the block manager: locally harmless (MEMORY_AND_DISK is
  * LRU-evictable), at cluster scale eviction churn and disk pressure.
  *
  * The contract: operators register every internal persist here;
  * drivers call [[release]] once the consuming action is done (Bench
  * and Verify do, per query). Caches whose consumers all complete
  * INSIDE the operator (the connected-components edge frames) are
  * unpersisted eagerly at the operator instead and never reach the
  * registry. CacheHygieneSpec holds the whole surface to it: after any
  * query + release, the context carries zero new persisted RDDs.
  */
object Caches {

  private val tracked = mutable.ArrayBuffer.empty[DataFrame]

  /** Register a frame this registry should unpersist on [[release]]. */
  def track(df: DataFrame): DataFrame = synchronized {
    tracked += df
    df
  }

  /** Persist AND eagerly materialize a reused intermediate, registered
    * for deferred release. Lazy persist lets AQE's concurrent stage
    * materialization race several consumers into the uncomputed cache —
    * duplicated work plus per-block lock contention (measured as
    * multi-× wall blowups). A cheap count() is a deterministic barrier:
    * every consumer then reads warm cache. */
  def materialized(df: DataFrame): DataFrame = {
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()
    track(cached)
  }

  /** Unpersist every tracked cache (non-blocking) and forget them.
    * Correctness-neutral at any point — an unpersisted frame recomputes
    * from lineage — so callers time it after the consuming action. */
  def release(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }
}
