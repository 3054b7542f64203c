package graft

import org.apache.spark.sql.functions._

/** Dev-only: q43 plan + intermediate cardinalities at sf0.1.
  * Run: sbt "Test/runMain graft.DevProbe4". */
object DevProbe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.engine.Tables
    import graft.operators.Dedup

    val docs = Tables.documents(spark, sfDir)
    val t = 0.5
    val sh = docs.select(col("doc_id").as("id"),
      array_sort(Dedup.shingles(col("text"), 3)).as("sh")).cache()
    sh.count()
    val inv = sh.select(col("id"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("s"))
    val dfreq = inv.groupBy("s").agg(count(lit(1)).as("df"))
    import org.apache.spark.sql.expressions.Window
    val byRarity = Window.partitionBy("id").orderBy(col("df"), col("s"))
    val prefixes = inv.join(dfreq, Seq("s"))
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <= col("n_sh") - ceil(col("n_sh") * t - 1e-9) + 1)
      .select("id", "n_sh", "s").cache()
    println(s"[probe4] prefixes = ${prefixes.count()}")
    var t0 = System.nanoTime()
    val joined = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          col("a.n_sh") >= col("b.n_sh") * t - 1e-9 &&
          col("b.n_sh") >= col("a.n_sh") * t - 1e-9)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    println(s"[probe4] raw candidate rows = ${joined.count()}  (${(System.nanoTime()-t0)/1e9} s)")
    t0 = System.nanoTime()
    val cands = joined.distinct().cache()
    println(s"[probe4] distinct candidates = ${cands.count()}  (${(System.nanoTime()-t0)/1e9} s)")
    t0 = System.nanoTime()
    val withArrays = cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
    println(s"[probe4] join-back rows = ${withArrays.count()}  (${(System.nanoTime()-t0)/1e9} s)")
    t0 = System.nanoTime()
    val kcount = withArrays
      .withColumn("c", graft.functions.TextKernels.sortedIntersectCol(col("sh_a"), col("sh_b")))
      .withColumn("jaccard", col("c").cast("double") / (size(col("sh_a")) + size(col("sh_b")) - col("c")))
      .filter(col("jaccard") >= t).count()
    println(s"[probe4] kernel-verified pairs = $kcount  (${(System.nanoTime()-t0)/1e9} s)")
    t0 = System.nanoTime()
    val hcount = withArrays
      .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= t).count()
    println(s"[probe4] hashset-verified pairs = $hcount  (${(System.nanoTime()-t0)/1e9} s)")
    spark.stop()
  }
}
