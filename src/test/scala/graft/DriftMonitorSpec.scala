package graft

import org.apache.spark.sql.functions._

import graft.operators.{Drift, Similarity}
import graft.streaming.DriftMonitor

/** The streaming drift monitor must equal its batch twin per batch,
  * resume numbering across runs, and refuse without a reference. */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(ids: Range, shift: Double) = ids.map { i =>
    (i.toLong, Array.tabulate(64)(d =>
      (math.sin(i * 31 + d * 7) + shift).toFloat))
  }.toDF("vec_id", "embedding")

  test("two-run monitor: per-batch PSI == batch twin; ids monotone across runs") {
    val ref = vecs(0 until 120, 1.5)
    val b1 = vecs(200 until 260, 1.5)   // reference-like traffic
    val b2 = vecs(300 until 360, -1.5)  // flipped cloud — must alarm
    val root = s"${graft.engine.Sinks.scratch}/driftmonitor_spec"
    val out = DriftMonitor.twoRunMonitor(spark, ref, b1, b2, root, nBits = 3)
      .orderBy("batch_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L),
      s"one row per run, numbered across runs: ${out.toSeq}")
    // Bit-equality with the batch-side statistic on the same split.
    def twin(cur: org.apache.spark.sql.DataFrame) =
      Drift.embeddingDrift(ref, cur, nBits = 3).head().getDouble(0)
    assert(out(0)._2 == twin(b1), "batch 1 PSI != batch twin")
    assert(out(1)._2 == twin(b2), "batch 2 PSI != batch twin")
    // The monitoring point: drifted traffic scores far above in-family.
    assert(out(1)._2 > out(0)._2 * 5,
      s"flipped batch should alarm: ${out.toSeq}")
    graft.engine.Caches.release()
  }

  test("monitor refuses to run without a completed reference") {
    val root = s"${graft.engine.Sinks.scratch}/driftmonitor_norefspec"
    graft.streaming.IncrementalIngest.deleteDir(spark, root)
    intercept[IllegalArgumentException] {
      DriftMonitor.runAvailable(spark, s"$root/src",
        vecs(0 until 2, 0.0).schema, s"$root/ref", s"$root/out",
        s"$root/cp")
    }
  }
}
