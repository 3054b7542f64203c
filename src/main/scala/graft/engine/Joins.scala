package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation joins for large×large shuffles.
  *
  * The engine's star joins broadcast their dims (StarSchema), so skew never
  * arises there. The case that remains at 100 TB is a large×large equi-join
  * whose key distribution is heavy-tailed — a hot key's rows all hash to
  * one reducer and that task runs hours while the rest of the cluster
  * idles. AQE's skew-join split (`spark.sql.adaptive.skewJoin`, on by
  * default) repairs this at runtime by splitting oversized partitions, but
  * it only acts on sort-merge/shuffle-hash joins it can re-plan and only at
  * partition granularity; a single key larger than one split is beyond it.
  * Salting is the static, key-granular fix: replicate one side `salt`
  * ways, scatter the other uniformly, and the hot key's work spreads over
  * `salt` reducers by construction.
  */
object Joins {

  /** Inner equi-join with the probe side's key skew spread over `salt`
    * reducers. The build side is replicated `salt`× (explode over the salt
    * range — a projection, no shuffle of extra rows until the join
    * exchange), the probe side gets a uniform salt per ROW, and the join
    * key becomes `(key, salt)`: every (probe row, build row) key match
    * meets in exactly one replica, so the result is bit-identical to the
    * plain join with every key — however hot — spread across `salt`
    * partitions.
    *
    * The probe salt is `xxhash64` over the probe's OTHER columns (not the
    * key — salting by the key alone would send each key back to one
    * reducer, recreating the skew): deterministic under task retries and
    * speculative execution, which a `rand()` salt is not. Rows identical
    * in every column share a replica; at that point the skew IS duplicate
    * rows and belongs to dedup, not the join.
    *
    * Cost model, explicitly: build-side shuffle volume scales by `salt`,
    * so this is for a build side much smaller than the probe side's hot
    * keys' blowup — size `salt` to the ratio of the hottest key's row
    * count to the average partition's (e.g. a 50M-row key over ~5M-row
    * partitions wants salt ≥ 10). */
  def saltedInner(probe: DataFrame, build: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val probeCols = probe.columns.filterNot(_ == key)
    val saltedProbe = probe.withColumn("_salt",
      pmod(xxhash64(probeCols.map(col).toIndexedSeq: _*), lit(salt)).cast("int"))
    val saltedBuild = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedProbe.join(saltedBuild, Seq(key, "_salt")).drop("_salt")
  }
}
