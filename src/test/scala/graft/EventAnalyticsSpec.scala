package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.EventAnalytics

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, ty, ts) => (u, ty, t(ts)) }
      .toDF("user_id", "event_type", "ts")

  test("funnel counts only in-order stage completions") {
    val events = ev(
      // user 1: full ordered funnel.
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:10:00"),
      // user 2: purchase BEFORE the view — only the view stage counts.
      (2L, "purchase", "2024-01-01 09:00:00"),
      (2L, "view", "2024-01-01 10:00:00"),
      // user 3: view then click, no purchase.
      (3L, "view", "2024-01-01 10:00:00"),
      (3L, "click", "2024-01-01 11:00:00"),
      // user 4: click only — no view, enters no stage.
      (4L, "click", "2024-01-01 10:00:00"))
    val r = EventAnalytics.funnel(events).head()
    assert(r.getAs[Long]("n_view") == 3L)
    assert(r.getAs[Long]("n_view_click") == 2L)
    assert(r.getAs[Long]("n_view_click_purchase") == 1L)
  }

  test("retention counts users active again exactly N days later") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-08 09:00:00"),   // retained (day 1 → day 8)
      (2L, "view", "2024-01-01 11:00:00"),   // not retained
      (2L, "view", "2024-01-05 11:00:00"),   // day 5, gone by day 12
      (3L, "view", "2024-01-08 12:00:00"))   // only active day 8
    val r = EventAnalytics.retention(events, days = 7)
      .orderBy("day").collect()
    val d1 = r.find(_.getAs[java.sql.Date]("day").toString == "2024-01-01").get
    assert(d1.getAs[Long]("n_active") == 2L)
    assert(d1.getAs[Long]("n_retained") == 1L)
    val d8 = r.find(_.getAs[java.sql.Date]("day").toString == "2024-01-08").get
    assert(d8.getAs[Long]("n_active") == 2L)
    assert(d8.getAs[Long]("n_retained") == 0L)
  }

  test("islands merge consecutive days and split on gaps") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-02 09:00:00"),
      (1L, "view", "2024-01-02 23:00:00"),   // same day, no new island
      (1L, "view", "2024-01-03 01:00:00"),
      (1L, "view", "2024-01-05 01:00:00"),   // gap → second island
      (2L, "view", "2024-01-10 01:00:00"))
    val got = EventAnalytics.activityIslands(events)
      .orderBy("user_id", "start_day").collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date]("start_day").toString,
        r.getAs[java.sql.Date]("end_day").toString, r.getAs[Long]("n_days")))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01", "2024-01-03", 3L),
      (1L, "2024-01-05", "2024-01-05", 1L),
      (2L, "2024-01-10", "2024-01-10", 1L)))
  }

  test("sketches stay within tolerance of their exact twins (q67)") {
    val out = Tables.events(spark, sf).groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        count_distinct(col("user_id")).as("exact_users"),
        percentile_approx(col("value"), lit(0.5), lit(10000))
          .as("approx_p50"),
        percentile(col("value"), lit(0.5)).as("exact_p50"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val exactU = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(r.getAs[Long]("approx_users") - exactU) / exactU < 0.05,
        s"HLL off by >5% on ${r.getString(0)}")
      val exactP = r.getAs[Double]("exact_p50")
      // GK sketch at accuracy 10000 on this data: near-exact rank, so
      // the value error stays within a few percent of the median.
      assert(math.abs(r.getAs[Double]("approx_p50") - exactP)
        <= math.abs(exactP) * 0.05 + 1e-9,
        s"approx p50 off on ${r.getString(0)}")
    }
  }

  test("path trigrams count per-user consecutive steps, never crossing users") {
    // User 1: a b a b a -> (a,b,a) x2, (b,a,b) x1. User 2: c d e ->
    // (c,d,e) x1 — and NO (a,c,d)-style phantom across the user boundary.
    def ev(id: Long, u: Long, t: Long, ty: String) =
      (id, u, new Timestamp(t * 1000L), ty)
    val events = (Seq(
      ev(0, 1, 10, "a"), ev(1, 1, 20, "b"), ev(2, 1, 30, "a"),
      ev(3, 1, 40, "b"), ev(4, 1, 50, "a"),
      ev(5, 2, 12, "c"), ev(6, 2, 22, "d"), ev(7, 2, 32, "e")
    )).toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.pathTrigrams(events, 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got == Seq(("a", "b", "a", 2L), ("b", "a", "b", 1L),
      ("c", "d", "e", 1L)))
  }

  test("count-min heavy hitters: one-sided error within the eps*N contract") {
    import org.apache.spark.util.sketch.CountMinSketch
    val ev = graft.engine.Tables.events(spark, TestSpark.sf)
    val n = ev.count()
    val bytes = ev
      .select(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"))
      .head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    exact.foreach { case (u, c) =>
      val est = cms.estimateCount(u)
      assert(est >= c, s"CMS must never underestimate: user $u est $est < $c")
      assert(est - c <= math.max(1L, (0.001 * n).toLong),
        s"user $u overestimate ${est - c} beyond eps*N")
    }
  }

  test("OHLC bars: open/close by (ts, event_id) total order, ties broken by id; no window in the plan") {
    // Two buckets; bucket 10:00 has a same-timestamp TIE at the open
    // (events 1 and 2 at 10:00:05) — event_id must break it — and the
    // close is the latest ts regardless of id order.
    val events = Seq(
      (2L, t("2024-03-01 10:00:05"), "view", 7.0),
      (1L, t("2024-03-01 10:00:05"), "view", 3.0),
      (3L, t("2024-03-01 10:59:59"), "view", 1.0),
      (4L, t("2024-03-01 10:30:00"), "view", 9.0),
      (5L, t("2024-03-01 11:00:00"), "view", 4.0),
      (6L, t("2024-03-01 10:15:00"), "click", 2.5))
      .toDF("event_id", "ts", "event_type", "value")
    val df = EventAnalytics.ohlcBars(events)
    val got = df.collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getLong(6), r.getDouble(7))).toMap
    assert(got((t("2024-03-01 10:00:00"), "view")) ==
      ((3.0, 9.0, 1.0, 1.0, 4L, 20.0)))   // open = id 1's value, not id 2's
    assert(got((t("2024-03-01 11:00:00"), "view")) ==
      ((4.0, 4.0, 4.0, 4.0, 1L, 4.0)))
    assert(got((t("2024-03-01 10:00:00"), "click")) ==
      ((2.5, 2.5, 2.5, 2.5, 1L, 2.5)))
    // The scale claim: argmin/argmax by struct order is a plain partial
    // aggregate — no per-bucket window sort anywhere in the plan.
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window sort in:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"),
      s"expected partial aggregation in:\n$plan")
  }

  test("rolling distinct users: window edges inclusive, distinct within window, only observed days") {
    import spark.implicits._
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // User 1 active days 1 and 5 (one distinct in any window holding both);
    // user 2 active day 1 only; user 3 active day 8 (outside day-5's
    // 7-day window [day-6, day], inside day-8's).
    val ev = Seq(
      (1L, ts(1)), (1L, ts(5)), (2L, ts(1)), (3L, ts(8))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.rollingDistinctUsers(ev, windowDays = 7)
      .select(col("day").cast("string"), col("dau"), col("wau7"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == Set("2024-01-01", "2024-01-05", "2024-01-08"),
      s"only observed days may appear: ${got.keySet}")
    assert(got("2024-01-01") == (2L, 2L)) // users 1,2
    // Day 5 window [dec 30..jan 5]: users 1 (twice, once distinct) and 2.
    assert(got("2024-01-05") == (1L, 2L))
    // Day 8 window [jan 2..8]: user 1 (day 5) and user 3 (day 8);
    // day-1 activity has aged out.
    assert(got("2024-01-08") == (1L, 2L))
  }
}
