package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events table: ordered conversion
  * funnels and day-N retention. Both are restated as aggregations and
  * equi-joins on `user_id`/day — per-user state never leaves its
  * reducer, no window over the whole stream, so the plans keep their
  * parallelism as user count grows with the data.
  */
object EventAnalytics {

  /** Ordered three-stage funnel: users with a `view`, users whose first
    * view is followed (≥, same-instant counts) by a `click`, and users
    * whose first such click is followed by a `purchase`. Emits one row
    * of stage counts. Each stage is a groupBy on user over a filtered
    * scan — the "first qualifying timestamp" chain makes the ordering
    * requirement explicit and keeps every step an aggregation instead
    * of a per-user sort. */
  def funnel(events: DataFrame): DataFrame = {
    val v = events.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("v_ts"))
    val c = events.where(col("event_type") === "click")
      .join(v, "user_id").where(col("ts") >= col("v_ts"))
      .groupBy("user_id").agg(min("ts").as("c_ts"))
    val p = events.where(col("event_type") === "purchase")
      .join(c, "user_id").where(col("ts") >= col("c_ts"))
      .groupBy("user_id").agg(min("ts").as("p_ts"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .agg(count("v_ts").as("n_view"),
        count("c_ts").as("n_view_click"),
        count("p_ts").as("n_view_click_purchase"))
  }

  /** Oracle twin of [[funnel]] (`events` hard-wired). */
  val funnelSql: String =
    """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
      |    WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e
      |    JOIN v ON e.user_id = v.user_id
      |    WHERE e.event_type = 'click' AND e.ts >= v.v_ts
      |    GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
      |    JOIN c ON e.user_id = c.user_id
      |    WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
      |    GROUP BY e.user_id)
      |SELECT count(v_ts) AS n_view, count(c_ts) AS n_view_click,
      |  count(p_ts) AS n_view_click_purchase
      |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)"""
      .stripMargin

  /** Day-N retention: for every active day, how many of its distinct
    * users are active again exactly `days` later. One distinct
    * projection to (day, user), one self-equi-join on (user, day+N) —
    * the day-offset join key is computed, so the join stays an
    * equi-join. */
  def retention(events: DataFrame, days: Int): DataFrame = {
    val du = events.select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val later = du.select(col("user_id"),
      date_sub(col("day"), days).as("day"), lit(1).as("_ret"))
    du.join(later, Seq("user_id", "day"), "left")
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        count("_ret").as("n_retained"))
  }

  /** Activity islands (gaps-and-islands): each user's maximal runs of
    * CONSECUTIVE active days, via the classic `day − row_number()`
    * anchor — consecutive days share an anchor, any gap shifts it.
    * One distinct projection, one per-user window (state never leaves
    * the user's reducer), one aggregation. The day-grain streak
    * complement to gap-based sessionization. */
  def activityIslands(events: DataFrame): DataFrame = {
    val du = events.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    du.withColumn("anchor",
        date_sub(col("day"), row_number().over(w)))
      .groupBy("user_id", "anchor")
      .agg(min("day").as("start_day"), max("day").as("end_day"),
        count(lit(1)).as("n_days"))
      .select("user_id", "start_day", "end_day", "n_days")
  }

  /** Oracle twin of [[activityIslands]] (`events` hard-wired). */
  val activityIslandsSql: String =
    """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |    FROM events),
      |a AS (SELECT user_id, day,
      |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
      |      AS INT) AS anchor
      |  FROM du)
      |SELECT user_id, min(day) AS start_day, max(day) AS end_day,
      |  count(*) AS n_days
      |FROM a GROUP BY user_id, anchor""".stripMargin

  /** Oracle twin of [[retention]] (`events` hard-wired). */
  def retentionSql(days: Int): String =
    s"""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
       |    FROM events)
       |SELECT a.day AS day, count(*) AS n_active,
       |  count(b.user_id) AS n_retained
       |FROM du a LEFT JOIN du b
       |  ON a.user_id = b.user_id AND b.day = a.day + $days
       |GROUP BY a.day""".stripMargin

  /** Top-k event-type trigrams (behavioral path mining): for every user,
    * each consecutive (e1 → e2 → e3) step under the total per-user event
    * order `(ts, event_id)`, counted corpus-wide. One shuffle on user_id
    * (the window sorts each user's OWN events only — state never crosses
    * users), then a partial/final count on the trigram key; the top-k cut
    * is total-ordered (count desc, then the three names) so the LIMIT
    * boundary is deterministic across engines and partitionings. The
    * next-event windows stop at user boundaries — no cross-user phantom
    * paths. */
  def pathTrigrams(events: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("e1"))
      .withColumn("e2", lead("e1", 1).over(w))
      .withColumn("e3", lead("e1", 2).over(w))
      .where(col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(k)
  }

  /** Oracle twin of [[pathTrigrams]] (`events` hard-wired). */
  def pathTrigramsSql(k: Int): String =
    s"""WITH seq AS (
       |  SELECT event_type AS e1,
       |    lead(event_type, 1) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS e2,
       |    lead(event_type, 2) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS e3
       |  FROM events)
       |SELECT e1, e2, e3, COUNT(*) AS n FROM seq
       |WHERE e3 IS NOT NULL
       |GROUP BY e1, e2, e3
       |ORDER BY n DESC, e1, e2, e3 LIMIT $k""".stripMargin

  /** Time-bucket OHLC downsampling: per (hour, event_type) the FIRST
    * and LAST event's value (open/close), the extremes (high/low), the
    * event count and the exact-decimal value sum — the order-sensitive
    * aggregate family (`first_value`-by-time per bucket) that telemetry
    * and market-data pipelines run as their standard resample.
    *
    * Scale shape: open/close are `min(struct(ts, event_id, value))` /
    * `max(...)` — Spark orders structs lexicographically, so the
    * argmin/argmax by the total (ts, event_id) order is a plain
    * PARTIAL-AGGREGABLE aggregate: map-side combine reduces every
    * partition to one candidate row per (bucket, type) before the
    * exchange, and NO per-bucket window sort exists anywhere in the
    * plan. A window formulation (`row_number` over ts) would shuffle
    * and sort every event; this shuffles one row per group per
    * partition. The tie-break is total (event_id is unique), so the
    * result is deterministic and the oracle — which deliberately uses
    * the window construction — must agree exactly. */
  def ohlcBars(events: DataFrame): DataFrame = {
    val key = struct(col("ts"), col("event_id"), col("value"))
    events
      .select(date_trunc("hour", col("ts")).as("bucket"),
        col("event_type"), col("ts"), col("event_id"), col("value"))
      .groupBy("bucket", "event_type")
      .agg(min(key).getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(key).getField("value").as("close"),
        count(lit(1)).as("n_events"),
        graft.engine.Aggregates.sumExact(col("value")).as("volume"))
  }

  /** SQL twin of [[ohlcBars]] via the window construction (`events`
    * hard-wired) — a deliberately different spelling of the same
    * argmin/argmax semantics. */
  def ohlcBarsSql(): String =
    s"""WITH ranked AS (SELECT date_trunc('hour', ts) AS bucket,
       |    event_type, value,
       |    ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts), event_type
       |      ORDER BY ts, event_id) AS rn_o,
       |    ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts), event_type
       |      ORDER BY ts DESC, event_id DESC) AS rn_c
       |  FROM events)
       |SELECT bucket, event_type,
       |  MAX(CASE WHEN rn_o = 1 THEN value END) AS open,
       |  MAX(value) AS high, MIN(value) AS low,
       |  MAX(CASE WHEN rn_c = 1 THEN value END) AS close,
       |  COUNT(*) AS n_events,
       |  ${graft.engine.Aggregates.sumExactSql("value")} AS volume
       |FROM ranked GROUP BY 1, 2""".stripMargin

  /** Rolling N-day distinct users (DAU + trailing-window WAU): sliding
    * DISTINCT is the aggregate window functions cannot express
    * (`count(DISTINCT) OVER` is unsupported) and a per-day self-join
    * over raw events re-scans the fact N times. The scale-safe shape:
    * dedup to (day, user) pairs ONCE (the fact collapses to at most
    * users × days rows), then explode each pair to the N window-end
    * days it contributes to — a map-side ×N of the SMALL deduped frame
    * — and count distinct per window end. At extreme scale the exact
    * distinct swaps for per-day HLL sketches merged across the window
    * (q67's machinery); the windowing construction is unchanged. */
  def rollingDistinctUsers(events: DataFrame, windowDays: Int): DataFrame = {
    val pairs = events
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val days = pairs.select(col("day")).distinct()
    val dau = pairs.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = pairs
      .select(explode(sequence(lit(0), lit(windowDays - 1))).as("off"),
        col("day"), col("user_id"))
      .select(date_add(col("day"), col("off")).as("day"), col("user_id"))
      // Only observed days — the explode also lands on the windowDays-1
      // days past the last event.
      .join(days, Seq("day"), "left_semi")
      .groupBy("day")
      .agg(countDistinct(col("user_id")).as(s"wau$windowDays"))
    dau.join(wau, Seq("day"))
  }

  /** Oracle spelling of [[rollingDistinctUsers]] — deliberately a
    * DIFFERENT construction (range join instead of offset explode), so
    * the gate checks the semantics, not the plan. */
  def rollingDistinctUsersSql(windowDays: Int): String =
    s"""WITH pairs AS (
       |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
       |days AS (SELECT DISTINCT day FROM pairs),
       |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
       |  FROM pairs GROUP BY 1),
       |wau AS (SELECT d.day,
       |    CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS wau$windowDays
       |  FROM days d JOIN pairs p
       |    ON p.day BETWEEN d.day - ${windowDays - 1} AND d.day
       |  GROUP BY 1)
       |SELECT day, dau, wau$windowDays
       |FROM dau JOIN wau USING (day)""".stripMargin
}
