package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only: stage-level timing for the pathological q24 run.
  * Run: sbt "Test/runMain graft.DevProbe3". */
object DevProbe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = mutable.ArrayBuffer[(Int, String, Long, Int, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(-1L)
        stages += ((si.stageId, si.name.split("\n").head.take(60),
          dur, si.numTasks, si.taskMetrics.executorRunTime,
          si.taskMetrics.executorCpuTime / 1000000,
          si.taskMetrics.jvmGCTime))
      }
    })

    val names = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").toSeq)
      .getOrElse(Seq("q11_distinct_months", "q23_ngram_jaccard",
        "q24_minhash_pairs", "q25_simhash_pairs", "q27_embedding_near_dup"))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(500)
      println(f"[probe3] ==== $name wall=$wall%7.2f s ====")
      stages.sortBy(-_._3).take(8).foreach { case (id, n2, dur, nt, run, cpu, gc) =>
        println(f"[probe3]   stage $id%4d dur=${dur / 1000.0}%8.2f s tasks=$nt%3d execRun=${run / 1000.0}%8.2f s cpu=${cpu / 1000.0}%8.2f s gc=${gc / 1000.0}%6.2f s  $n2")
      }
      stages.clear()
    }
    spark.stop()
  }
}
