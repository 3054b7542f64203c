package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{Aggregates, Sinks, StarSchema}

/** Dev-only: step-level dissection of q32_sink_roundtrip.
  * Run: sbt "Test/runMain graft.DevProbe4". */
object DevProbe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"${Sinks.scratch}/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe4] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val am = Aggregates.airlineMonthlyPerformance(StarSchema.wideView(spark, sfDir))
    t("am.count (warm-up)") { am.count() }
    t("am.count (again)") { am.count() }
    val path = s"${Sinks.scratch}/probe4_parquet"
    t("write overwrite m<=6") {
      Sinks.writeParquet(am.filter(col("month") <= 6), path, "overwrite", Seq("month"))
    }
    t("write append m>6") {
      Sinks.writeParquet(am.filter(col("month") > 6), path, "append", Seq("month"))
    }
    t("read back + orderBy + count") {
      spark.read.parquet(path).orderBy("airline_name", "month").count()
    }
    t("write overwrite NO partitionBy") {
      Sinks.writeParquet(am.filter(col("month") <= 6), s"$path2nd", "overwrite")
    }
    spark.stop()
  }

  private val path2nd = s"${Sinks.scratch}/probe4_parquet2"
}
