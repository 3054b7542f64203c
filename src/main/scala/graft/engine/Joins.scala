package graft.engine

import org.apache.spark.sql.{DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.expressions.Window
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

  /** Backward as-of join — for every left row, attach the single right
    * row with the greatest `(rightTs, remaining right columns)` such that
    * `rightTs <= leftTs`, within the same `key` group. LEFT semantics:
    * an unmatched left row keeps null right fields. Output columns are
    * the left columns followed by the right columns minus `key`
    * (`rightTs` first).
    *
    * Spark has no ASOF JOIN; the naive relational spelling is a range
    * join (`l.key = r.key AND r.ts <= l.ts` plus an argmax) whose
    * matched-pair count is quadratic per key. This is the scalable
    * shape instead: tag both inputs, UNION them, and take a running
    * `last(right_struct, ignoreNulls)` over a window partitioned by
    * `key` and ordered by `(ts, side, right_struct)` — ONE shuffle on
    * `key`, one per-group sort, zero row blowup no matter how many right
    * rows precede a left row. Right rows order before left rows at equal
    * timestamps, so the match is inclusive; ties among right rows at the
    * same timestamp resolve to the struct-greatest row (deterministic
    * when the right payload carries a unique id). */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rPayload = rightTs +: right.columns.filterNot(c => c == key || c == rightTs).toSeq
    require(lCols.intersect(rPayload).isEmpty,
      s"left/right column collision: ${lCols.intersect(rPayload).mkString(",")}")
    val lStruct = struct(lCols.map(col): _*)
    val rStruct = struct(rPayload.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val lTagged = left.select(col(key).as("_k"), col(leftTs).as("_ts"),
      lit(1).as("_side"), lStruct.as("_l"), lit(null).cast(rType).as("_r"))
    val rTagged = right.select(col(key).as("_k"), col(rightTs).as("_ts"),
      lit(0).as("_side"), lit(null).cast(lType).as("_l"), rStruct.as("_r"))
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts").asc, col("_side").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("_m", last("_r", ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(lCols.map(c => col(s"_l.$c")) ++
        rPayload.map(c => col(s"_m.$c").as(c)): _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row of
    * the same key with `rightTs >= leftTs` — "next quote after the
    * trade", "next maintenance after the failure". Exact mirror of
    * [[asofBackward]]'s one-shuffle union + running-`last` construction
    * with the window order reversed (ts desc; right rows sort before
    * left at equal ts so at-or-after includes ties; among equal-ts right
    * rows the maximum payload struct wins, matching the backward
    * convention). Same scale shape: ONE shuffle on the key, no range
    * join, no row blowup. */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rPayload = rightTs +: right.columns.filterNot(c => c == key || c == rightTs).toSeq
    require(lCols.intersect(rPayload).isEmpty,
      s"left/right column collision: ${lCols.intersect(rPayload).mkString(",")}")
    val lStruct = struct(lCols.map(col): _*)
    val rStruct = struct(rPayload.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val lTagged = left.select(col(key).as("_k"), col(leftTs).as("_ts"),
      lit(1).as("_side"), lStruct.as("_l"), lit(null).cast(rType).as("_r"))
    val rTagged = right.select(col(key).as("_k"), col(rightTs).as("_ts"),
      lit(0).as("_side"), lit(null).cast(lType).as("_l"), rStruct.as("_r"))
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts").desc, col("_side").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("_m", last("_r", ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(lCols.map(c => col(s"_l.$c")) ++
        rPayload.map(c => col(s"_m.$c").as(c)): _*)
  }

  /** Skew-safe backward as-of join — [[asofBackward]] with the ONE
    * reducer-per-key ceiling removed. The plain construction's window
    * partitions by `key`, so a dominant key (one hot symbol in the
    * quotes-trades shape) sorts its entire history on a single reducer
    * no matter how many executors exist. Here the timeline is cut into
    * `slices` fixed-width time ranges (global min/max epoch — ONE
    * bounded scalar aggregate, same driver-materialization class as the
    * CC convergence counter) and the construction becomes two-level:
    *
    *  1. window over `(key, slice)` — the hot key's sort spreads over
    *     up to `slices` reducers; within a slice the running
    *     `last(_r, ignoreNulls)` is exactly the plain construction,
    *  2. per `(key, slice)` the right side's TAIL value (the struct the
    *     running last ends the slice on — `max_by` over the same
    *     `(ts, struct)` order as the window tie-break),
    *  3. a carry table: for every `(key, slice)` present, the latest
    *     tail from any EARLIER slice (running last over slice index,
    *     partitioned by key — but this frame has at most
    *     |keys|·`slices` rows, metadata scale for the bounded key
    *     domains this variant targets), broadcast back and
    *     `coalesce(local match, carry)`.
    *
    * Bit-identical to [[asofBackward]] (asserted in JoinsSpec on a
    * 90 %-single-key fixture): same-ts ties stay inside one slice
    * (slice is a function of ts), so the window tie order is preserved,
    * and a left row's match is either in its own slice (local window)
    * or is the latest right row of an earlier slice (carry).
    *
    * Preconditions/contract: non-null timestamps (ordinary in the
    * market-data shape; the plain variant remains for data with null
    * ts), and a key domain bounded enough that |keys|·`slices` is
    * metadata (symbols, users — not fact-scale surrogates; for an
    * unbounded domain, split hot keys to this variant and the long tail
    * to the plain one). Degenerate single-point timelines collapse to
    * slice 0 and the plain semantics. */
  def asofBackwardSkewSafe(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, slices: Int = 32): DataFrame = {
    require(slices >= 1, s"slices must be >= 1, got $slices")
    val lCols = left.columns.toSeq
    val rPayload = rightTs +: right.columns.filterNot(c => c == key || c == rightTs).toSeq
    require(lCols.intersect(rPayload).isEmpty,
      s"left/right column collision: ${lCols.intersect(rPayload).mkString(",")}")
    val lStruct = struct(lCols.map(col): _*)
    val rStruct = struct(rPayload.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val lTagged = left.select(col(key).as("_k"), col(leftTs).as("_ts"),
      lit(1).as("_side"), lStruct.as("_l"), lit(null).cast(rType).as("_r"))
    val rTagged = right.select(col(key).as("_k"), col(rightTs).as("_ts"),
      lit(0).as("_side"), lit(null).cast(lType).as("_l"), rStruct.as("_r"))
    val u = lTagged.unionByName(rTagged)

    // Slice key: epoch micros for timestamps, the raw value for numeric
    // ts domains (the construction only needs a slice that is a
    // monotone function of ts, so same-ts ties stay within one slice).
    def tsLong(c: org.apache.spark.sql.Column) =
      u.schema("_ts").dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case _ => c.cast("long")
      }
    val bounds = u.agg(
      min(tsLong(col("_ts"))), max(tsLong(col("_ts")))).head()
    // Empty input (or all-null ts, outside this variant's contract):
    // the plain construction handles both, and there is no skew to cut.
    if (bounds.isNullAt(0))
      return asofBackward(left, right, key, leftTs, rightTs)
    val minUs = bounds.getLong(0)
    val width = math.max(1L, (bounds.getLong(1) - minUs) / slices + 1)
    val sliced = u.withColumn("_slice",
      ((tsLong(col("_ts")) - minUs) / width).cast("int"))

    val w = Window.partitionBy("_k", "_slice")
      .orderBy(col("_ts").asc, col("_side").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sliced.withColumn("_m", last("_r", ignoreNulls = true).over(w))

    val tails = sliced.where(col("_side") === 0)
      .groupBy("_k", "_slice")
      .agg(max_by(col("_r"), struct(col("_ts"), col("_r"))).as("_tail"))
    val wc = Window.partitionBy("_k").orderBy("_slice")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = sliced.select("_k", "_slice").distinct()
      .join(tails, Seq("_k", "_slice"), "left")
      .withColumn("_carry", last("_tail", ignoreNulls = true).over(wc))
      .select("_k", "_slice", "_carry")

    local.join(broadcast(carry), Seq("_k", "_slice"))
      .withColumn("_m2", coalesce(col("_m"), col("_carry")))
      .where(col("_side") === 1)
      .select(lCols.map(c => col(s"_l.$c")) ++
        rPayload.map(c => col(s"_m2.$c").as(c)): _*)
  }

  /** Inner equi-join with the probe side PRE-FILTERED by a Bloom filter
    * built over the build side's keys — semi-join reduction, the classic
    * 100 TB shuffle cut. When the build side is a SELECTIVE dim subset
    * (too many keys to broadcast-hash-join cheaply, far fewer than the
    * probe's), the plain shuffle join still exchanges EVERY probe row;
    * here only rows whose key might match survive to the exchange, so
    * shuffle volume drops to (match rate + fpp) of the probe.
    *
    * Exactness: a Bloom filter has no false negatives, and the join
    * itself removes the false positives — the result is bit-identical to
    * the plain join (asserted in JoinsSpec and by the q88 oracle). This
    * is Spark's own runtime-filter rewrite
    * (`spark.sql.optimizer.runtime.bloomFilter.*`) made explicit and
    * unconditional: the optimizer's version only fires on statistics
    * heuristics with a shuffle-or-broadcast already on the build side;
    * this one is a two-job operator the caller controls.
    *
    * Build is fully distributed (partial Bloom filters per partition,
    * OR-merged), with only the final ~`1.2·numBits/8` bytes reaching the
    * driver; the probe-side test is the codegen'd Catalyst
    * `might_contain` over `xxhash64(key)`, evaluated in the SCAN stage
    * before the exchange. `expectedItems` is an upper bound on the build
    * side's distinct keys (overestimating only wastes bits: ~1.2 bytes
    * per expected item at fpp 1%) — size it to the dim's real
    * cardinality at scale. */
  def bloomPrunedInner(probe: DataFrame, build: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame =
    probe.where(bloomKeyFilter(build, key, expectedItems, fpp))
      .join(build, Seq(key))

  /** The probe-side predicate of [[bloomPrunedInner]], exposed so callers
    * can push the same semi-join reduction into any downstream plan
    * (e.g. prune a fact before a union or an aggregation that later joins
    * the dim). Runs the distributed Bloom build (one small job) NOW and
    * returns the codegen'd `might_contain` test over `xxhash64(key)`:
    * true for every key present in `build` (no false negatives), true
    * with probability ≤ `fpp` for absent keys. */
  def bloomKeyFilter(build: DataFrame, key: String, expectedItems: Long,
      fpp: Double = 0.01): org.apache.spark.sql.Column = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // Optimal bit count for an n-item filter at false-positive rate p.
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val bloomAgg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftSql.expression(col(key)))),
      Literal(expectedItems), Literal(numBits), 0, 0)
    val bytes = build
      .select(GraftSql.column(bloomAgg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    // Zero build rows aggregate to a null filter; `might_contain(null, …)`
    // would null-type the literal — an always-false predicate keeps the
    // probe schema and lets Spark skip the scan entirely.
    if (bytes == null) lit(false)
    else GraftSql.column(BloomFilterMightContain(
      Literal(bytes), new XxHash64(Seq(GraftSql.expression(col(key))))))
  }

  /** Inner join of timestamped points to (possibly overlapping)
    * `[start, end)` intervals WITHOUT a nested loop. A raw
    * `pt >= start AND pt < end` predicate has no equi-key, so Catalyst
    * plans BroadcastNestedLoopJoin — O(|points|·|intervals|) compares,
    * and a driver OOM the moment the interval side outgrows the
    * broadcast threshold. Binning restores an equi-key: each interval
    * explodes into the fixed-width time bins it overlaps, each point
    * maps to its one bin, the join runs as a plain shuffle equi-join on
    * the bin id, and the residual range predicate removes same-bin
    * non-overlaps. Row blowup is `interval_span / binSeconds` per
    * interval — size `binSeconds` near the typical interval length so
    * the explode stays O(1) per interval.
    *
    * Bin ids are computed with integral `div` on epoch MICROSECONDS
    * (double division would lose integer precision above 2^53 ≈ 104 days
    * of microseconds). `div` truncates toward zero, so pre-1970
    * timestamps are out of contract. */
  def binnedIntervalJoin(points: DataFrame, pointTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be > 0, got $binSeconds")
    val widthUs = binSeconds * 1000000L
    val binnedIntervals = intervals
      // An empty interval matches nothing — and would otherwise make
      // `sequence` (which runs DESCENDING when start > stop) fabricate bins.
      .where(col(startCol) < col(endCol))
      .withColumn("_s_us", unix_micros(col(startCol)))
      .withColumn("_e_us", unix_micros(col(endCol)))
      .withColumn("_bin", explode(sequence(
        expr(s"_s_us div ${widthUs}L"),
        // end is exclusive: the last overlapped bin holds end - 1 µs.
        expr(s"(_e_us - 1L) div ${widthUs}L"))))
      .drop("_s_us", "_e_us")
    points
      .withColumn("_p_us", unix_micros(col(pointTs)))
      .withColumn("_bin", expr(s"_p_us div ${widthUs}L"))
      .join(binnedIntervals, Seq("_bin"))
      .where(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("_bin", "_p_us")
  }
}
