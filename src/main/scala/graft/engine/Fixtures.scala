package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fingerprint-keyed build-once artifact directories — the one shared
  * implementation of the pattern the media fixtures and the persisted
  * ANN indexes both need (two hand-rolled copies drifted apart in
  * round 10's first cut; review finding).
  *
  * Key scheme: artifacts that are a PURE FUNCTION of an id'd input
  * (media payloads derived from doc_id) are fully determined by the
  * id-set fingerprint `(count, max)` — distinct scale factors land in
  * distinct directories, and a regenerated testdata set with different
  * ids misses the cache instead of serving stale bytes. Artifacts that
  * additionally depend on column CONTENT (ANN indexes on embedding
  * values) fold an exact content checksum into the key via
  * `contentSig` — see [[ensure]].
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
  * each call. The memo applies ONLY to pure-function-of-ids artifacts
  * (`contentSig = None`): a memo hit skips the fingerprint, so it
  * assumes the id set at `memoKey` is immutable for the JVM lifetime —
  * safe there because the artifact is fully determined by the ids, and
  * ids regenerated AT THE SAME PATH mid-JVM are outside the scratch
  * layout's single-writer contract (documented, not defended).
  * Content-keyed artifacts (`contentSig` defined) NEVER consult the
  * memo: their whole point is that same-ids/different-values data must
  * miss, and a memo hit would serve the stale artifact the signature
  * exists to prevent (review finding) — they pay the cheap aggregate
  * on every call instead. Single-writer scope, like the rest of the
  * scratch layout. */
object Fixtures {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def marker(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_FIXTURE_COMPLETE")

  /** Resolve (building at most once) the artifact dir for `kind` over
    * the id'd frame: `<root>/<kind>_n<count>_m<maxId>[_c<sig>]`.
    * `build` receives the target dir and must leave every table fully
    * written when it returns.
    *
    * `contentSig`: artifacts that depend on column CONTENT beyond the
    * id set (an ANN index depends on the embedding values; regenerated
    * testdata with the same vec_ids but different vectors must MISS)
    * pass a cheap deterministic column — it is summed exactly (decimal,
    * order-independent) and folded into the directory name, so changed
    * content lands in a fresh dir instead of serving a stale artifact
    * against fresh-data oracles. Artifacts that are a pure function of
    * the ids (the synthetic media payloads) pass None. */
  def ensure(spark: SparkSession, keyed: DataFrame, idCol: String,
      root: String, kind: String, memoKey: Option[String],
      contentSig: Option[Column] = None)
      (build: String => Unit): String = {
    val fsOf = (d: String) => new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Content-keyed artifacts never memoize — see the object scaladoc.
    val cacheKey =
      if (contentSig.isDefined) null
      else memoKey.map(k => s"$k|$root|$kind").orNull
    if (cacheKey != null) {
      val hit = memo.get(cacheKey)
      // Re-probe the completion marker on a memo hit (one metadata
      // call): a fixture deleted mid-JVM (external scratch cleanup)
      // must trigger a rebuild, not a raw path-not-found downstream.
      if (hit != null) {
        if (fsOf(hit).exists(marker(hit))) return hit
        memo.remove(cacheKey)
      }
    }
    val aggs = Seq(count(col(idCol)), coalesce(max(col(idCol)), lit(-1L))) ++
      contentSig.map(c => coalesce(
        sum(c.cast(org.apache.spark.sql.types.DecimalType(28, 6))),
        lit(java.math.BigDecimal.ZERO)).cast("string"))
    val key = keyed.agg(aggs.head, aggs.tail: _*).head()
    // String.hashCode is specified (31-polynomial) — stable across
    // JVMs, so the signature token survives process restarts.
    val sig = if (contentSig.isEmpty) ""
      else "_c" + java.lang.Integer.toHexString(key.getString(2).hashCode)
    val dir = s"$root/${kind}_n${key.getLong(0)}_m${key.getLong(1)}$sig"
    val fs = fsOf(dir)
    if (!fs.exists(marker(dir))) {
      // A dir without the completion marker is an INTERRUPTED build —
      // wipe it before re-running. Pre-manifest layouts made a
      // rebuild-in-place idempotent; under [[Manifests]] the retried
      // build/append sequence would PUBLISH NEW VERSIONS on top of the
      // partial ones (version numbers encode build history), aging the
      // early versions a time-travel pin targets past the keep horizon.
      //
      // SINGLE-PROCESS-PER-SCRATCH CONTRACT (the wipe makes it load-
      // bearing): if two JVMs shared one scratch root, this delete
      // could destroy the OTHER process's in-progress build mid-
      // publish — before the wipe, concurrent rebuild-in-place was
      // merely redundant; now it is destructive. The scratch layout
      // has always been single-writer (the memo's immutability
      // assumption, the Manifests claim being per-artifact not
      // per-root); the harness honors it by running the verify and
      // bench mains sequentially. Processes that must share a root
      // need external serialization, same as any Manifests store.
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      build(dir)
      fs.create(marker(dir), true).close()
    }
    if (cacheKey != null) memo.put(cacheKey, dir)
    dir
  }
}
