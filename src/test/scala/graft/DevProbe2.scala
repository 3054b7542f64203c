package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Dev-only: per-query wall vs GC vs codegen-compile attribution.
  * Run: sbt "Test/runMain graft.DevProbe2". */
object DevProbe2 {
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
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.expressions.codegen",
      org.apache.logging.log4j.Level.INFO)

    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

    val names = sys.env.get("SPARK_GRAFT_PROBE")
      .map(_.split(",").toSeq)
      .getOrElse(Seq("q11_distinct_months", "q23_ngram_jaccard",
        "q24_minhash_pairs", "q25_simhash_pairs", "q27_embedding_near_dup"))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val g0 = gcMillis
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[probe2] $name%-26s wall=$wall%7.2f s gc=${(gcMillis - g0) / 1000.0}%6.2f s")
    }
    spark.stop()
  }
}
