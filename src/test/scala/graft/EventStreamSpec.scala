package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.engine.Tables
import graft.streaming.EventStream

case class Ev(ts: Timestamp, event_type: String, value: Double)

class EventStreamSpec extends SparkSpec {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("batch mode: windowed KPIs over the events table") {
    val out = EventStream.windowedKpis(Tables.events(spark, sf)).cache()
    assert(out.count() > 0)
    // Tumbling windows: every start is aligned to the hour.
    assert(out.filter(minute(col("window_start")) =!= 0).count() == 0)
    // Counts reconcile to the raw table.
    val total = out.agg(sum("n_events")).head().getLong(0)
    assert(total == Tables.events(spark, sf).count())
    out.unpersist()
  }

  test("streaming: tumbling windows finalize via watermark; late data dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[Ev]
    val sink = EventStream.windowedKpis(source.toDF(),
        windowDur = "1 hour", watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("ev_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      // Window [10:00, 11:00): two events, one "delayed" (value > 100).
      source.addData(
        Ev(t("2024-01-01 10:05:00"), "click", 50.0),
        Ev(t("2024-01-01 10:20:00"), "click", 150.0))
      sink.processAllAvailable()
      // Nothing finalized yet — watermark still inside the window.
      assert(spark.table("ev_sink").count() == 0)
      // An event at 12:00 pushes the watermark to 11:50 > 11:00, so the
      // 10:00 window finalizes on the following micro-batch.
      source.addData(Ev(t("2024-01-01 12:00:00"), "click", 10.0))
      sink.processAllAvailable()
      val rows = spark.table("ev_sink")
        .filter(col("window_start") === t("2024-01-01 10:00:00")).collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Long]("n_events") == 2L)
      assert(rows(0).getAs[Long]("n_delayed") == 1L)
      // A late event behind the watermark is dropped — the finalized
      // window is NOT re-emitted and no new 10:00 row appears.
      source.addData(Ev(t("2024-01-01 10:40:00"), "click", 999.0))
      sink.processAllAvailable()
      assert(spark.table("ev_sink")
        .filter(col("window_start") === t("2024-01-01 10:00:00")).count() == 1)
    } finally sink.stop()
  }
}
