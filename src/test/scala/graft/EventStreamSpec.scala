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

  test("streaming parquet sink: end-to-end round-trip with state eviction") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = s"${graft.engine.Sinks.scratch}/ev-parquet-sink"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val source = MemoryStream[Ev]
    val sink = EventStream.startParquetSink(
      EventStream.windowedKpis(source.toDF(),
        windowDur = "1 hour", watermarkDelay = "10 minutes"),
      path = s"$root/data", checkpointDir = s"$root/chk",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      // Two types in the 10:00 window → two state rows, nothing written.
      source.addData(
        Ev(t("2024-01-01 10:05:00"), "click", 50.0),
        Ev(t("2024-01-01 10:20:00"), "view", 150.0))
      sink.processAllAvailable()
      // 13:00 event → watermark 12:50 → the 10:00 window finalizes: its
      // rows land in parquet and its state rows are evicted.
      source.addData(Ev(t("2024-01-01 13:00:00"), "click", 10.0))
      sink.processAllAvailable()
      val written = spark.read.parquet(s"$root/data")
      assert(written.count() == 2)
      assert(written.filter(col("window_start") =!= t("2024-01-01 10:00:00"))
        .count() == 0)
      assert(written.filter(col("event_type") === "view")
        .head().getAs[Long]("n_delayed") == 1L)
      // State eviction: only the open 13:00 window's row remains.
      val state = sink.recentProgress.reverse
        .find(_.stateOperators.nonEmpty).get.stateOperators(0)
      assert(state.numRowsTotal == 1,
        s"expected finalized windows evicted, state holds ${state.numRowsTotal}")
    } finally sink.stop()
  }

  test("streaming foreachBatch bridge reuses the batch parquet sink") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = s"${graft.engine.Sinks.scratch}/ev-feb-sink"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val source = MemoryStream[Ev]
    val sink = EventStream.startForeachBatchSink(
      EventStream.windowedKpis(source.toDF(),
        windowDur = "1 hour", watermarkDelay = "10 minutes"),
      path = s"$root/data", checkpointDir = s"$root/chk")
    try {
      source.addData(
        Ev(t("2024-01-01 10:05:00"), "click", 50.0),
        Ev(t("2024-01-01 10:20:00"), "click", 150.0))
      sink.processAllAvailable()
      source.addData(Ev(t("2024-01-01 13:00:00"), "click", 10.0))
      sink.processAllAvailable()
      val written = spark.read.parquet(s"$root/data")
      val row = written.head()
      assert(written.count() == 1)
      assert(row.getAs[Long]("n_events") == 2L)
      assert(row.getAs[Long]("n_delayed") == 1L)
    } finally sink.stop()
  }
}
