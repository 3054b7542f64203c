package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Curation, QualityClassifier}
import graft.streaming.{FunnelMonitor, IncrementalIngest}

/** Streaming filter-funnel monitor: streaming == batch twin per batch,
  * cross-run batch numbering, replay idempotence, refusal without a
  * stored model. */
class FunnelMonitorSpec extends SparkSpec {

  private val good = "the data and the table scan with the fast filter plan"
  private val bad = "zz!!" // fails min_tokens AND the model
  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def trainModel(dir: String): Unit = {
    import spark.implicits._
    IncrementalIngest.deleteDir(spark, dir)
    val labeled = ((1L to 4L).map(i => (i, good + s" v$i", true)) ++
      (5L to 8L).map(i => (i, s"spam casino jackpot $i click winner now", false)))
      .toSeq.toDF("doc_id", "text", "label_good")
    QualityClassifier.saveModel(labeled, "text", "label_good", dir)
  }

  private val batch1 = Seq(101L -> good, 102L -> bad,
    103L -> (good + " extra"))
  // 201 is 12-token fluent spam: passes min_tokens and the heuristic
  // quality gate — only the MODEL can catch it.
  private val batch2 = Seq(
    201L -> "spam casino jackpot click winner pills prize free spam casino winner click",
    202L -> good)

  private def rows(df: DataFrame): Seq[(Long, Int, String, Long, Long, Long)] =
    df.orderBy("batch_id", "stage").collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq

  test("two-run monitor: per-batch funnels equal the batch twin; numbering spans runs") {
    val root = s"${graft.engine.Sinks.scratch}/funnel_monitor_spec"
    val model = s"$root/model"
    trainModel(model)
    val out = FunnelMonitor.twoRunFunnel(spark, model,
      df(batch1: _*), df(batch2: _*), root)
    val got = rows(out)
    // The twin: filterFunnel over each batch scored the same way.
    def twin(b: Seq[(Long, String)], id: Long) = {
      val scored = df(b: _*).join(
        QualityClassifier.scoreFromModel(df(b: _*), model, "doc_id", "text")
          .select(col("doc_id"), col("quality_score")), Seq("doc_id"))
      Curation.filterFunnel(scored, FunnelMonitor.modelGates)
        .withColumn("batch_id", lit(id))
        .select("batch_id", "stage", "gate", "n_in", "n_dropped", "n_out")
    }
    val want = rows(twin(batch1, 1L).union(twin(batch2, 2L)))
    assert(got == want, "streaming funnel must equal the batch twin per batch")
    // Batch 1's shape: 3 in; 102 dies at min_tokens; both good docs pass.
    assert(got.take(3).map(t => (t._4, t._5, t._6)) ==
      Seq((3L, 1L, 2L), (2L, 0L, 2L), (2L, 0L, 2L)))
    // Batch 2: the spam doc passes min_tokens but the MODEL kills it.
    assert(got.drop(3).map(t => (t._4, t._5, t._6)) ==
      Seq((2L, 0L, 2L), (2L, 0L, 2L), (2L, 1L, 1L)),
      s"model gate must catch fluent spam: ${got.drop(3)}")
    graft.engine.Caches.release()
  }

  test("replayed batch overwrites its own rows; missing model refuses") {
    val root = s"${graft.engine.Sinks.scratch}/funnel_monitor_replay"
    val (model, out) = (s"$root/model", s"$root/out")
    trainModel(model)
    IncrementalIngest.deleteDir(spark, out)
    FunnelMonitor.funnelBatch(df(batch1: _*), 1L, model, out)
    val first = rows(spark.read.parquet(out).select(
      col("batch_id").cast("long").as("batch_id"), col("stage"),
      col("gate"), col("n_in"), col("n_dropped"), col("n_out")))
    FunnelMonitor.funnelBatch(df(batch1: _*), 1L, model, out)
    val replayed = rows(spark.read.parquet(out).select(
      col("batch_id").cast("long").as("batch_id"), col("stage"),
      col("gate"), col("n_in"), col("n_dropped"), col("n_out")))
    assert(replayed == first, "a replayed batch must replace, not append")
    assertThrows[IllegalArgumentException] {
      FunnelMonitor.runAvailable(spark, s"$root/src", df(batch1: _*).schema,
        s"$root/no_such_model", out, s"$root/cp")
    }
    graft.engine.Caches.release()
  }
}
