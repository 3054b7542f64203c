package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fingerprint-keyed build-once artifact directories — the one shared
  * implementation of the pattern the media fixtures and the persisted
  * ANN indexes both need (two hand-rolled copies drifted apart in
  * round 10's first cut; review finding).
  *
  * Key scheme: artifacts that are a PURE FUNCTION of an id'd input
  * (media payloads derived from doc_id, ANN indexes trained on the
  * vec_id'd corpus) are fully determined by the id-set fingerprint
  * `(count, max)` — distinct scale factors land in distinct
  * directories, and a regenerated testdata set with different ids
  * misses the cache instead of serving stale bytes.
  *
  * Completion gate: a `_FIXTURE_COMPLETE` marker committed strictly
  * AFTER the caller's whole build sequence returns. Per-table parquet
  * `_SUCCESS` files are NOT sufficient for multi-table artifacts (an
  * index build-then-append sequence has windows where every table so
  * far looks complete) — a crash anywhere before the marker leaves a
  * visibly-incomplete directory that rebuilds, never a half-built
  * artifact behind a valid gate.
  *
  * Memoization: `memoKey` (e.g. the source data directory)
  * short-circuits the fingerprint aggregate and filesystem probe on
  * repeat calls in the same JVM, keeping fixture plumbing out of
  * benchmark-timed windows; callers that cannot name a stable source
  * identity pass None and pay the (cheap, metadata-served) aggregate
  * each call. Single-writer scope, like the rest of the scratch
  * layout. */
object Fixtures {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def marker(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_FIXTURE_COMPLETE")

  /** Resolve (building at most once) the artifact dir for `kind` over
    * the id'd frame: `<root>/<kind>_n<count>_m<maxId>`. `build`
    * receives the target dir and must leave every table fully written
    * when it returns. */
  def ensure(spark: SparkSession, keyed: DataFrame, idCol: String,
      root: String, kind: String, memoKey: Option[String])
      (build: String => Unit): String = {
    val cacheKey = memoKey.map(k => s"$k|$root|$kind").orNull
    if (cacheKey != null) {
      val hit = memo.get(cacheKey)
      if (hit != null) return hit
    }
    val key = keyed.agg(count(col(idCol)),
      coalesce(max(col(idCol)), lit(-1L))).head()
    val dir = s"$root/${kind}_n${key.getLong(0)}_m${key.getLong(1)}"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker(dir))) {
      build(dir)
      fs.create(marker(dir), true).close()
    }
    if (cacheKey != null) memo.put(cacheKey, dir)
    dir
  }
}
