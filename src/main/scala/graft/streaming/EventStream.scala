package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Aggregates

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

  /** SQL twin of the batch-mode plan (DuckDB `time_bucket` = tumbling
    * window start). */
  def windowedKpisSql(delayThreshold: Double = 100.0): String =
    s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       |  event_type, COUNT(*) AS n_events,
       |  SUM(CASE WHEN value > $delayThreshold THEN 1 ELSE 0 END) AS n_delayed,
       |  ${Aggregates.sumExactSql("value")} AS total_value
       |FROM events GROUP BY 1, 2""".stripMargin
}
