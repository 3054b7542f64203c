package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{Clustering, Similarity}

/** Dev-only q28 phase-timing probe (test sourceset, never shipped):
  * separates trainer cost from IVF probe cost, cold vs warm JVM, to
  * root-cause the round-7 8x flag. Run: sbt "Test/runMain graft.DevProbe5". */
object DevProbe5 {
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

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    for (round <- 1 to 2) {
      val emb = Tables.embeddings(spark, sfDir)
      t(s"r$round scan+count")(emb.count())
      val cents = t(s"r$round trainer(53,2)") {
        val c = Clustering.kmeansCentroids(emb, "vec_id", "embedding", 53, 2)
        c.count(); c
      }
      t(s"r$round ivf probe only")(
        Similarity.ivfTopKWith(emb.filter(col("vec_id") < 10), emb, 5, cents, 3)
          .orderBy("query_id", "rank").count())
      t(s"r$round full q28")(
        SparkEntry.queries("q28_ivf_topk")(spark, sfDir).count())
    }
    spark.stop()
  }
}
