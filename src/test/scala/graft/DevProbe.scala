package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.engine.Tables
import graft.operators.Dedup

/** Dev-only stage-by-stage timing probe (test sourceset, never shipped).
  * Run: sbt "Test/runMain graft.DevProbe". */
object DevProbe {
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

    val docs = Tables.documents(spark, sfDir)
    t("docs.count")(docs.count())

    val sh = docs.select(col("doc_id").as("id"),
      Dedup.shingles(col("text"), 3).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("shingles persist+count")(sh.count())

    val sig = Dedup.minhashSignatures(sh, "id", "sh", 64, 42L)
    t("signatures.count")(sig.count())

    val r = 4
    val bandArr = array((0 until 16).map(j =>
      concat_ws(":", lit(j).cast("string"),
        concat_ws("_", (j * r until (j + 1) * r).map(i =>
          col(s"m$i").cast("string")): _*))): _*)
    val banded = sig.select(col("id"), explode(bandArr).as("band"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("banded persist+count")(banded.count())

    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    t("candidates.count")(cands.count())

    val verified = cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.5)
    t("verify.count")(verified.count())

    spark.catalog.clearCache()
    t("q24 end-to-end")(
      Dedup.minhashNearDup(docs, "doc_id", "text").count())

    spark.stop()
  }
}
