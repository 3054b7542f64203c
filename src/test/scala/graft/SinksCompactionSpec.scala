package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Sinks

/** Small-file compaction: content identity, the FFD packing bound, and
  * exact one-file-per-bin placement (the hash-aligned-key construction
  * must land every planned bin in its own write task). */
class SinksCompactionSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(name).toString

  test("sized write: tiny frame collapses to one file; bulk frame splits near target") {
    import spark.implicits._
    import graft.engine.Sinks
    def parquetFiles(dir: String): Array[java.io.File] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    // A dimension-sized frame with huge targetBytes: ONE file, no
    // matter how many tasks produced it.
    val small = tmp("sized-small")
    val nSmall = Sinks.writeParquetSized(
      (0 until 100).toDF("k").repartition(16), small, "overwrite",
      targetBytes = 1L << 30)
    assert(nSmall == 1 && parquetFiles(small).length == 1,
      s"expected 1 file, got $nSmall / ${parquetFiles(small).length}")
    // A bulk frame read FROM DISK (so the optimizer has real byte
    // stats) with a small target: file count tracks size/target, and
    // the round-trip preserves content.
    val src = tmp("sized-src"); val out = tmp("sized-out")
    (0 until 200000).map(i => (i.toLong, s"pad-$i-${i * 2654435761L}"))
      .toDF("k", "pad").repartition(4).write.mode("overwrite").parquet(src)
    val onDisk = spark.read.parquet(src)
    val target = 256L * 1024
    val n = Sinks.writeParquetSized(onDisk, out, "overwrite", target)
    assert(n > 1, s"expected a multi-file split, got $n")
    val files = parquetFiles(out)
    assert(files.length == n)
    assert(spark.read.parquet(out).count() == 200000)
    // File-scan stats are on-disk bytes, so parquet→parquet at ratio
    // 1.0 must land file sizes NEAR the target, not 4x off (loose
    // bounds: re-encoding shifts compression somewhat).
    val avg = files.map(_.length).sum.toDouble / files.length
    assert(avg <= 2.0 * target && avg >= target / 8.0,
      s"avg file size $avg not near target $target (n=$n)")
  }

  test("sized write: stats-less lineage falls back to existing partitioning, never a file storm") {
    import graft.engine.Sinks
    // An RDD-backed frame carries the defaultSizeInBytes sentinel —
    // without the guard the helper would clamp to 100000 partitions.
    val rdd = spark.sparkContext.parallelize(
      (0 until 1000).map(i => org.apache.spark.sql.Row(i.toLong)), 3)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    val df = spark.createDataFrame(rdd, schema)
    val out = tmp("sized-sentinel")
    val n = Sinks.writeParquetSized(df, out, "overwrite",
      targetBytes = 128L * 1024 * 1024)
    assert(n == 3, s"expected the frame's own 3 partitions, got $n")
    assert(new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet")) == 3)
    assert(spark.read.parquet(out).count() == 1000)
  }

  test("sized write: a huge honest join-product estimate still takes the sizing path") {
    import spark.implicits._
    // Chained cross joins multiply the leaf byte stats: a few-hundred-
    // byte parquet leaf crossed 6 times estimates >= Long.MaxValue/2 —
    // the zone the old magnitude-threshold check misread as the
    // stats-less sentinel and wrote with upstream partitioning,
    // skipping the sizing the helper promises. The LEAVES carry real
    // file stats, so the sized path must run.
    val src = tmp("sized-big-src")
    (0 until 2).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(src)
    val leaf = spark.read.parquet(src)
    def planSize(d: org.apache.spark.sql.DataFrame): BigInt =
      d.queryExecution.optimizedPlan.stats.sizeInBytes
    // Cross until the estimate first crosses the zone boundary — the
    // exact leaf byte count varies with parquet encoding, so the join
    // depth is chosen at runtime (rows stay <= 2^depth, tiny).
    var df = leaf.select(col("k").as("k0"), col("v").as("v0"))
    var i = 1
    while (planSize(df) < BigInt(Long.MaxValue) / 2 && i < 12) {
      df = df.crossJoin(leaf.select(col("k").as(s"k$i"), col("v").as(s"v$i")))
      i += 1
    }
    val rows = math.pow(2, i).toLong
    val planBytes = planSize(df)
    assert(planBytes >= BigInt(Long.MaxValue) / 2,
      s"fixture must sit in the old misclassification zone, got $planBytes")
    // The sizing basis is clamped to 1024x the LEAF bytes (size-only
    // join estimates multiply child byte counts — dimensionally
    // garbage at this depth), so a degenerate estimate yields a few
    // files, never a 100000-task repartition of kilobytes.
    val leafSum = df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum.max(1)
    val basis = planBytes.min(leafSum * 1024)
    assert(basis < planBytes, "fixture must exercise the estimate clamp")
    // Target chosen so the sized path asks for a HANDFUL of files —
    // distinguishable from both extremes (1 file, or the join output's
    // own partitioning).
    val target = (basis / 8).toLong.max(1)
    val out = tmp("sized-big-out")
    val n = Sinks.writeParquetSized(df, out, "overwrite", target)
    val want = ((basis + target - 1) / target).toInt
    assert(n == want && n > 1,
      s"expected the sized partition count $want (>1), got $n")
    assert(spark.read.parquet(out).count() == rows)
  }

  test("compaction preserves content, honors the packing bound, and " +
      "emits exactly one file per planned bin") {
    import spark.implicits._
    val in = tmp("compact-in")
    val out = tmp("compact-out")
    val df = (0 until 20000)
      .map(i => (i.toLong, s"doc-$i", i % 97, i.toDouble / 7))
      .toDF("id", "name", "bucket", "score")
    // Over-parallel write: the small-file storm compaction exists for.
    df.repartition(40).write.mode("overwrite").parquet(in)

    def dataFiles(dir: String) = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith("."))
    val inFiles = dataFiles(in)
    assert(inFiles.length == 40)
    val total = inFiles.map(_.length).sum
    val target = total / 4 // expect ~5 bins from 40 files

    val stats = Sinks.compactParquet(spark, in, out, target)

    assert(stats.inputFiles == 40)
    assert(stats.inputBytes == total)
    // Packing bound: every bin within max(target, largest input file).
    val cap = math.max(target, inFiles.map(_.length).max)
    assert(stats.binInputBytes.forall(_ <= cap),
      s"bin over cap: ${stats.binInputBytes} vs $cap")
    assert(stats.binInputBytes.sum == total, "every input byte binned once")
    assert(stats.outputFiles < stats.inputFiles)
    // The exchange must land each bin on its own task: file count on
    // disk == planned bins (an empty partition would write no file, a
    // collision would merge two bins into one).
    assert(dataFiles(out).length == stats.outputFiles)

    val back = spark.read.parquet(out)
    assert(back.columns.sorted.toSeq == df.columns.sorted.toSeq)
    assert(back.count() == 20000)
    assert(back.except(df).isEmpty && df.except(back).isEmpty,
      "compacted content must be row-identical to the input")
  }

  test("oversize files pass through as single-file bins") {
    import spark.implicits._
    val in = tmp("compact-big-in")
    val out = tmp("compact-big-out")
    (0 until 5000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(4).write.mode("overwrite").parquet(in)
    // Target below every file size: nothing merges, each file = one bin.
    val stats = Sinks.compactParquet(spark, in, out, targetBytes = 1)
    assert(stats.outputFiles == stats.inputFiles)
    assert(stats.binInputBytes.forall(_ > 1))
    val back = spark.read.parquet(out)
    assert(back.count() == 5000)
    assert(back.except(spark.read.parquet(in)).isEmpty)
  }

  test("single merged bin collapses the directory to one file") {
    import spark.implicits._
    val in = tmp("compact-one-in")
    val out = tmp("compact-one-out")
    (0 until 5000).map(i => (i.toLong, i * 3)).toDF("id", "x")
      .repartition(16).write.mode("overwrite").parquet(in)
    val stats = Sinks.compactParquet(spark, in, out, targetBytes = Long.MaxValue)
    assert(stats.outputFiles == 1 && stats.binInputBytes.size == 1)
    val back = spark.read.parquet(out)
    assert(back.count() == 5000)
    assert(back.except(spark.read.parquet(in)).isEmpty)
  }
}
