package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.engine.{Aggregates, Sinks}

/** Structured Streaming extension (SURVEY.md §2.I/§7 — explicitly beyond
  * the reference, whose "real-time" is interactive re-filtering of batch
  * caches, `/root/reference/src/app.py:56-87`). This is the idiomatic
  * Spark restatement of the product's "live KPI" claim: tumbling
  * event-time windows with a watermark bounding state.
  *
  * The same plan runs in batch mode (`withWatermark` is a no-op on a
  * batch DataFrame), which is how the DuckDB oracle covers the window
  * operator; the streaming path is covered by a `MemoryStream` spec.
  *
  * Scale notes: the aggregation state is keyed by (window, event_type) —
  * bounded cardinality — and the watermark evicts windows older than the
  * delay, so state size is O(active windows × types) regardless of input
  * rate. Partial aggregation still applies per micro-batch, and the only
  * shuffle is the one the group-by needs anyway.
  */
object EventStream {

  /** Tumbling-window KPIs: event count, "delayed" count (value over the
    * threshold — the flight-delay analog on the events table), and an
    * exact-decimal value total per (window, event_type). */
  def windowedKpis(events: DataFrame, windowDur: String = "1 hour",
      watermarkDelay: String = "10 minutes",
      delayThreshold: Double = 100.0): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("value") > delayThreshold, 1).otherwise(0)).as("n_delayed"),
        Aggregates.sumExact(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("n_delayed"),
        col("total_value"))

  /** Streaming OHLC downsample — [[graft.operators.EventAnalytics
    * .ohlcBars]]' order-sensitive open/close under watermarked tumbling
    * windows. The lexicographic-struct argmin/argmax is a plain
    * aggregate, so it runs STATEFUL-PARTIAL in streaming exactly like
    * count/sum: per-window state is one candidate struct per bound
    * (constant size), finalized and evicted by the watermark — an
    * order-sensitive statistic with NO per-window buffering of events,
    * which a row_number-window formulation could not stream at all
    * (non-monotonic rank over an unbounded group). */
  def streamingOhlc(events: DataFrame, windowDur: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val key = struct(col("ts"), col("event_id"), col("value"))
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(min(key).getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(key).getField("value").as("close"),
        count(lit(1)).as("n_events"),
        Aggregates.sumExact(col("value")).as("volume"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_events"), col("volume"))
  }

  /** Streaming parquet sink for the windowed KPIs: append-mode file sink —
    * only watermark-finalized windows are written, each exactly once
    * (checkpointed offsets + the sink's transaction log give end-to-end
    * exactly-once on files). State is evicted as the watermark passes each
    * window, so a continuously-running job holds O(active windows × types)
    * state regardless of how long it runs. Default trigger processes all
    * available data then stops (batch-style catch-up); pass e.g.
    * `Trigger.ProcessingTime("1 minute")` for a resident job. */
  def startParquetSink(kpis: DataFrame, path: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    kpis.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .start()

  /** Streaming → batch-sink bridge: each micro-batch of finalized windows
    * is handed to the batch parquet sink ([[Sinks.writeParquet]], append
    * mode), the idiomatic way to reuse a batch write path (JDBC, MERGE,
    * custom formats) under a streaming trigger. Exactly-once downgrades to
    * at-least-once across restarts (foreachBatch may replay a batch);
    * idempotent sinks should dedup on `batchId`. */
  def startForeachBatchSink(kpis: DataFrame, path: String,
      checkpointDir: String): StreamingQuery =
    kpis.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) Sinks.writeParquet(batch, path, "append")
      }
      .start()

  /** Streaming exact dedup — the streaming twin of [[graft.operators.Dedup.exact]]
    * for continuous document ingestion: re-occurrences of the same content
    * fingerprint arriving within the watermark delay are dropped,
    * first-seen wins (emitted immediately in append mode).
    *
    * `dropDuplicatesWithinWatermark` keys state on the 16-byte MD5
    * fingerprint, NOT the document text, so the state store holds one
    * small record per distinct document seen inside the watermark horizon
    * and the watermark evicts expired fingerprints — bounded state on an
    * unbounded stream, the property plain `dropDuplicates` (which keeps
    * every key forever) does not have. After eviction a re-arriving
    * duplicate is a NEW document by construction; exact global dedup over
    * an unbounded horizon is the batch operator's job downstream. */
  def dedupStream(docs: DataFrame, tsCol: String, textCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs.withColumn("_fp", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  // ------------------------------------------------------- sessionization

  /** Per-user sessions: consecutive events of a user belong to one
    * session while inter-event gaps stay ≤ `gapMinutes`. Batch form:
    * session boundaries via `lag` over (user, time), session ids via a
    * running sum of boundary flags, then one aggregation per session.
    * Gap comparison is exact integer microseconds (`unix_micros`), ties
    * broken by event_id, and the value total is the exact-decimal
    * [[Aggregates.sumExact]] — all so the DuckDB twin is bit-identical.
    *
    * Scale: both windows and the final aggregation partition by
    * `user_id` — state and sort runs are per-user (thousands of rows),
    * never global, and user cardinality grows with the data, so the plan
    * keeps its parallelism at 100 TB. */
  def sessionsBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prev = lag(col("ts"), 1).over(w)
    events
      .withColumn("new_s",
        when(prev.isNull ||
          unix_micros(col("ts")) - unix_micros(prev) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        Aggregates.sumExact(col("value")).as("total_value"))
  }

  /** SQL twin of [[sessionsBatch]] (DuckDB; `epoch_us` = `unix_micros`). */
  def sessionsBatchSql(gapMinutes: Int = 30): String = {
    val gapUs = gapMinutes * 60L * 1000000L
    s"""WITH o AS (
       |  SELECT user_id, event_id, ts, value,
       |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events),
       |f AS (
       |  SELECT *, CASE WHEN prev IS NULL
       |      OR epoch_us(ts) - epoch_us(prev) > $gapUs THEN 1 ELSE 0 END AS new_s
       |  FROM o),
       |s AS (
       |  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
       |    ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS session_idx
       |  FROM f)
       |SELECT user_id, session_idx,
       |  min(ts) AS session_start, max(ts) AS session_end,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  ${Aggregates.sumExactSql("value")} AS total_value
       |FROM s GROUP BY user_id, session_idx""".stripMargin
  }

  /** Built-in session windows: the declarative alternative to the
    * `flatMapGroupsWithState` sessionizer below — `session_window`
    * merges a user's events whose gaps are strictly under the duration
    * and Spark manages the (streaming-capable) merge state itself. Use
    * this form when per-session output needs no custom logic; drop to
    * the typed state operator only for bespoke semantics (running
    * session counters, mid-session triggers).
    *
    * Gap semantics match [[sessionsBatch]]: Spark merges session
    * windows that overlap OR touch, so an event landing EXACTLY `gap`
    * after its predecessor still joins the session (inclusive `<=`,
    * pinned by EventStreamSpec). The one shape difference is the
    * emitted `session_end`: `last_ts + gap` (the window end), not
    * `last_ts`. The SQL twin reproduces both. */
  def sessionsViaSessionWindow(events: DataFrame,
      gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        Aggregates.sumExact(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** SQL twin of [[sessionsViaSessionWindow]] (inclusive-gap merge,
    * window end = last event + gap). */
  def sessionsViaSessionWindowSql(gapMinutes: Int = 30): String = {
    val gapUs = gapMinutes * 60L * 1000000L
    s"""WITH o AS (
       |  SELECT user_id, event_id, ts, value,
       |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events),
       |f AS (
       |  SELECT *, CASE WHEN prev IS NULL
       |      OR epoch_us(ts) - epoch_us(prev) > $gapUs THEN 1 ELSE 0 END
       |    AS new_s
       |  FROM o),
       |s AS (
       |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id
       |    ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM f)
       |SELECT user_id, min(ts) AS session_start,
       |  max(ts) + INTERVAL $gapMinutes MINUTE AS session_end,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  ${Aggregates.sumExactSql("value")} AS total_value
       |FROM s GROUP BY user_id, sid""".stripMargin
  }

  /** One input event for the streaming sessionizer. */
  case class SessEvent(user_id: Long, event_id: Long, ts: Timestamp,
      value: Double)

  /** One emitted session (same shape/semantics as a [[sessionsBatch]]
    * row). */
  case class Session(user_id: Long, session_idx: Long,
      session_start: Timestamp, session_end: Timestamp, n_events: Long,
      total_value: Double)

  /** Open-session state: bounds in epoch micros, the exact value total as
    * a 6-dp-scaled long (bit-compatible with `sumExact`'s DECIMAL(28,6)
    * accumulation), and the running per-user session counter. */
  case class SessState(idx: Long, startUs: Long, endUs: Long, n: Long,
      totalScaled: Long)

  private def micros(ts: Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  private def scaled6(v: Double): Long =
    new java.math.BigDecimal(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  private def toSession(userId: Long, s: SessState): Session =
    Session(userId, s.idx, toTs(s.startUs), toTs(s.endUs), s.n,
      new java.math.BigDecimal(java.math.BigInteger.valueOf(s.totalScaled), 6)
        .doubleValue())

  /** Streaming sessionization: the custom-state operator Structured
    * Streaming is built for — `flatMapGroupsWithState` keyed on
    * `user_id` with an EVENT-TIME timeout. A session closes either
    * inline (a later event of the same user arrives past the gap) or by
    * watermark timeout (no event arrived and the watermark passed
    * `session_end + gap`), so state is exactly one small record per user
    * with an open session, regardless of input rate — the property that
    * makes this run forever on an unbounded stream.
    *
    * Within-gap out-of-order events merge into the open session (bounds
    * extend both directions); events older than an already-emitted
    * session are watermark-dropped upstream. Input must carry a
    * watermark on `ts` (append output mode requires it for timeouts). */
  def sessionizeStream(events: Dataset[SessEvent],
      gapMinutes: Int = 30): Dataset[Session] = {
    val gapUs = gapMinutes * 60L * 1000000L
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessState]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, evs: Iterator[SessEvent], state: GroupState[SessState]) => {
          if (state.hasTimedOut) {
            val closed = toSession(userId, state.get)
            state.remove()
            Iterator.single(closed)
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var st = state.getOption
            evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
              val us = micros(e.ts)
              st match {
                case None =>
                  st = Some(SessState(1L, us, us, 1L, scaled6(e.value)))
                case Some(s) if us - s.endUs > gapUs =>
                  out += toSession(userId, s)
                  st = Some(SessState(s.idx + 1, us, us, 1L, scaled6(e.value)))
                case Some(s) =>
                  st = Some(s.copy(
                    startUs = math.min(s.startUs, us),
                    endUs = math.max(s.endUs, us),
                    n = s.n + 1,
                    totalScaled = s.totalScaled + scaled6(e.value)))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endUs / 1000 + gapMinutes * 60L * 1000)
            }
            out.iterator
          }
        })
  }

  // --------------------------------------------------- stream-stream join

  /** Purchase→view attribution as a stream-stream INTERVAL join: every
    * (purchase, view) pair of the same user with the view inside the
    * `lookbackMinutes` window before the purchase (inclusive both ends).
    * Unlike the batch as-of join (q52, latest view only) this keeps ALL
    * attributing views — the multi-touch attribution shape.
    *
    * The same plan runs batch (watermarks are no-ops) — that is what the
    * DuckDB oracle covers; under streaming sources the time-interval
    * condition is what makes the join feasible forever: Spark derives a
    * state-eviction bound from it (a buffered view can stop waiting once
    * the purchase watermark passes `view_ts + lookback`; a purchase once
    * the view watermark passes `purchase_ts`), so both state stores stay
    * O(events inside watermark + lookback), not O(stream history).
    * Both watermarks are required for that bound — without them a
    * stream-stream inner join buffers everything.
    *
    * `views` must carry (user_id, view_id, view_ts), `purchases`
    * (user_id, purchase_id, purchase_ts). */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
      lookbackMinutes: Int,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val v = views.withColumnRenamed("user_id", "v_user")
      .withWatermark("view_ts", watermarkDelay)
    val p = purchases.withWatermark("purchase_ts", watermarkDelay)
    p.join(v,
      col("v_user") === col("user_id") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") -
          expr(s"INTERVAL $lookbackMinutes MINUTES"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("view_id"), col("view_ts"))
  }

  /** SQL twin of [[attributionJoin]]'s batch plan (`events` hard-wired,
    * same inclusive window). */
  def attributionJoinSql(lookbackMinutes: Int): String =
    s"""SELECT p.event_id AS purchase_id, p.user_id,
       |  p.ts AS purchase_ts, v.event_id AS view_id, v.ts AS view_ts
       |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       |JOIN (SELECT * FROM events WHERE event_type = 'view') v
       |  ON p.user_id = v.user_id
       |  AND v.ts <= p.ts
       |  AND v.ts >= p.ts - INTERVAL $lookbackMinutes MINUTES""".stripMargin

  /** The upsert table's version layout: immutable `v<N>/` snapshot
    * directories published by zero-byte `MANIFEST-<N>` marker files.
    * The LIVE version is the greatest published marker; a version dir
    * without its marker does not exist as far as any reader is
    * concerned. Markers are zero-padded so a directory listing sorts
    * them, but resolution parses the number (padding is cosmetic). */
  private def versionDir(path: String, v: Long) =
    new org.apache.hadoop.fs.Path(path, f"v$v%08d")
  private def versionMarker(path: String, v: Long) =
    new org.apache.hadoop.fs.Path(path, f"MANIFEST-$v%08d")

  /** Version number named by a `MANIFEST-<N>` marker file name, or None
    * for any malformed `MANIFEST-`-prefixed stray. The ONE parser both
    * resolution and GC go through: a stray a reader tolerates must also
    * be a stray the GC sweep tolerates, or a single junk file wedges the
    * streaming query (every checkpoint replay re-crashes on it). */
  private def parseMarkerVersion(name: String): Option[Long] =
    Some(name.stripPrefix("MANIFEST-"))
      .filter(s => name.startsWith("MANIFEST-") && s.nonEmpty &&
        s.length <= 18 && s.forall(_.isDigit)) // <=18 digits: toLong can't overflow
      .map(_.toLong)

  /** All PUBLISHED versions at `path`, ascending (empty when the sink
    * is uninitialized). One metadata listing. A `MANIFEST-`-prefixed
    * name whose suffix is not a number is ignored rather than crashing
    * resolution — only the writer's own well-formed markers publish. */
  private def publishedVersions(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .flatMap(parseMarkerVersion).sorted
  }

  /** Streaming MERGE sink: each micro-batch UPSERTs into a parquet
    * target by key ([[graft.operators.Merge.upsert]] inside
    * `foreachBatch`) — the CDC-apply pattern every lakehouse table
    * format runs under its streaming writer: matched keys replaced by
    * the batch's newest row, new keys inserted, untouched keys carried
    * forward. Within a batch the newest row per key wins (`max_by` on
    * the order column — a micro-batch can hold several changes for one
    * key).
    *
    * COMMIT PROTOCOL — a versioned-directory manifest, the same
    * metadata idea Delta/Iceberg implement, reduced to the two
    * filesystem primitives that ARE atomic on HDFS and local FS
    * (exclusive file create; file delete). Each batch: (1) resolve the
    * live version N = max published `MANIFEST-*` marker; (2) merge the
    * batch into `v<N>`'s rows and write the result to `v<N+1>/`
    * (overwrite mode, so an orphan left by a previous crash is simply
    * replaced); (3) PUBLISH by creating the zero-byte `MANIFEST-<N+1>`
    * — one atomic create, after which every resolution sees N+1;
    * (4) garbage-collect versions older than `keepVersions`, marker
    * strictly BEFORE data dir so no reachable marker ever names a
    * partially-deleted dir. Published version dirs are IMMUTABLE —
    * nothing is ever renamed or rewritten under a reader, which is
    * what eliminates the read-during-swap race the previous
    * staged-rename protocol could only document.
    *
    * Crash recovery needs no branching: a death before (3) leaves an
    * unpublished orphan `v<N+1>` that the checkpoint's replay
    * overwrites (the upsert is idempotent per (key, batch)); a death
    * after (3) but inside (4) leaves stale markers/dirs the next
    * batch's GC sweeps. The table is ALWAYS the newest published
    * version — never partial, never stale.
    *
    * `keepVersions` is the reader-horizon contract (Delta's vacuum
    * retention, in miniature): a reader that resolved version N keeps
    * a complete immutable snapshot under it for at least
    * `keepVersions - 1` subsequent batch commits. Size it to the
    * longest-running reader; 2 suffices for readers shorter than a
    * batch interval. Object stores without atomic create/list
    * visibility need the real table formats — that adjudication
    * stands.
    *
    * Relation to [[graft.engine.Manifests]] (the shared segment-based
    * generalization of this protocol the stored indexes run): the sink
    * deliberately keeps WHOLE-VERSION directories rather than
    * segment-listing manifests, because a MERGE sink rewrites the full
    * table every batch by definition — there is no O(batch) append
    * segment for a manifest to buy, so version dir = segment and the
    * extra manifest file would be pure indirection. */
  def startUpsertSink(changes: DataFrame, path: String,
      checkpointDir: String, key: String, orderCol: String,
      keepVersions: Int = 2): StreamingQuery = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    changes.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val fs = new org.apache.hadoop.fs.Path(path)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val versions = publishedVersions(fs, path)
          val live = versions.lastOption
          val next = live.getOrElse(0L) + 1
          val cols = batch.columns.filterNot(_ == key)
          val newest = batch.groupBy(col(key))
            .agg(max_by(struct(cols.map(col): _*), col(orderCol)).as("_r"))
            .select(col(key) +: cols.map(c => col(s"_r.$c").as(c)): _*)
          val merged = live match {
            case None => newest
            case Some(v) => graft.operators.Merge.upsert(
              spark.read.parquet(versionDir(path, v).toString), newest, key)
          }
          // (2) stage the new immutable snapshot; overwrite sweeps any
          // unpublished orphan a crashed predecessor left here.
          merged.write.mode("overwrite")
            .parquet(versionDir(path, next).toString)
          // (3) publish: one atomic exclusive create.
          fs.create(versionMarker(path, next), false).close()
          // (4) GC everything below the keep horizon, marker strictly
          // before dir. Swept by LISTING rather than from the resolved
          // version set, so a dir orphaned by a crash mid-GC (marker
          // deleted, dir not) is reclaimed by the next batch instead
          // of leaking forever.
          val keepFrom = (versions :+ next).takeRight(keepVersions).head
          val names = fs.listStatus(new org.apache.hadoop.fs.Path(path))
            .toSeq.map(_.getPath.getName)
          names.flatMap(parseMarkerVersion).filter(_ < keepFrom)
            .foreach(v => fs.delete(versionMarker(path, v), false))
          names.filter(n => n.length > 1 && n.length <= 19 &&
              n.startsWith("v") && n.drop(1).forall(_.isDigit))
            .map(_.drop(1).toLong).filter(_ < keepFrom)
            .foreach(v => fs.delete(versionDir(path, v), true))
          ()
        }
      }
      .start()
  }

  /** Reader for a [[startUpsertSink]] table: resolve the greatest
    * published `MANIFEST-<N>` marker, read the immutable `v<N>/` it
    * names. No retries, no fallback precedence, no tolerated race
    * spellings — a published version is complete by construction
    * (the marker is created only after the snapshot's own `_SUCCESS`)
    * and immutable until it ages past the writer's `keepVersions`
    * horizon, which is the one contract the caller sizes (a reader
    * must finish within `keepVersions - 1` subsequent commits).
    * Fails loudly only on an uninitialized sink. */
  def readUpsertTable(spark: SparkSession, path: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = publishedVersions(fs, path).lastOption.getOrElse(
      throw new java.io.FileNotFoundException(
        s"$path holds no published upsert-table version (no MANIFEST-* " +
          "marker) — not an initialized sink, or an aborted first batch"))
    spark.read.parquet(versionDir(path, live).toString)
  }

  /** End-to-end batch-cadence driver for [[startUpsertSink]], returning
    * the maintained table (the newest published version): batch 1 lands in the
    * source dir and a first `AvailableNow` run folds it into the target;
    * batch 2 lands and a second run (same checkpoint, so ONLY the new
    * files) folds into the existing state. The read-back proves both
    * halves of the MERGE contract at once — keys seen only in batch 1
    * are carried forward across runs, keys re-seen in batch 2 show
    * batch 2's newest row (within-batch newest by `orderCol`). When the
    * caller splits so batch 2's `orderCol` values sit strictly above
    * batch 1's, the fold equals the global newest-per-key — a plain SQL
    * oracle (q123). */
  def twoRunUpsert(spark: SparkSession, batch1: DataFrame, batch2: DataFrame,
      scratchRoot: String, key: String, orderCol: String): DataFrame = {
    val src = s"$scratchRoot/src"
    val table = s"$scratchRoot/table"
    val cp = s"$scratchRoot/checkpoint"
    Seq(src, table, cp).foreach(IncrementalIngest.deleteDir(spark, _))
    def run(): Unit = {
      val changes = spark.readStream.schema(batch1.schema).parquet(src)
      startUpsertSink(changes, table, cp, key, orderCol).awaitTermination()
    }
    batch1.write.mode("append").parquet(src)
    run()
    batch2.write.mode("append").parquet(src)
    run()
    readUpsertTable(spark, table)
  }

  /** Stream-static enrichment join: each streaming event looks up its key
    * in a STATIC (batch) dimension. The stateless member of the streaming
    * join family — unlike the stream-stream join above there is NO state
    * store and NO watermark requirement: Spark re-evaluates the static
    * side per micro-batch (so a dim refresh lands by swapping the
    * underlying table between batches) and the explicit broadcast keeps
    * the lookup off the shuffle path — the standard shape for enriching
    * an event stream against slowly-changing reference data at any
    * stream rate. Left join: events with no dim row pass through with
    * nulls (an enrichment must never drop events). */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** SQL twin of the batch-mode plan (DuckDB `time_bucket` = tumbling
    * window start). */
  def windowedKpisSql(delayThreshold: Double = 100.0): String =
    s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       |  event_type, COUNT(*) AS n_events,
       |  SUM(CASE WHEN value > $delayThreshold THEN 1 ELSE 0 END) AS n_delayed,
       |  ${Aggregates.sumExactSql("value")} AS total_value
       |FROM events GROUP BY 1, 2""".stripMargin
}
