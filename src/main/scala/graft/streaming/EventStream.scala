package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

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

  /** SQL twin of the batch-mode plan (DuckDB `time_bucket` = tumbling
    * window start). */
  def windowedKpisSql(delayThreshold: Double = 100.0): String =
    s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       |  event_type, COUNT(*) AS n_events,
       |  SUM(CASE WHEN value > $delayThreshold THEN 1 ELSE 0 END) AS n_delayed,
       |  ${Aggregates.sumExactSql("value")} AS total_value
       |FROM events GROUP BY 1, 2""".stripMargin
}
