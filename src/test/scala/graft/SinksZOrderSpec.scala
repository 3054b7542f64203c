package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Sinks

/** Z-order layout: interleave correctness and the locality property the
  * layout exists for — a box-filtered scan touches few files. */
class SinksZOrderSpec extends SparkSpec {

  test("zValue interleaves bits (x even positions, y odd)") {
    import spark.implicits._
    // x=5 (101), y=3 (011): bit i of x -> 2i, bit i of y -> 2i+1:
    // 1,1,0,1,1,0 (lsb first) = 0b011011 = 27.
    val got = Seq((5L, 3L), (0L, 0L), (1L, 0L), (0L, 1L),
      ((1L << 21) - 1, (1L << 21) - 1))
      .toDF("x", "y")
      .select(Sinks.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(27L, 0L, 1L, 2L, (1L << 42) - 1))
    assert(got.last > 0, "21+21 bits must stay in the positive long range")
  }

  test("zValue is monotone in each dimension with the other fixed") {
    import spark.implicits._
    val xs = (0L until 100L).toDF("x")
    val zx = xs.select(Sinks.zValue(col("x"), lit(7L)).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(zx == zx.sorted && zx.distinct.size == zx.size)
    val zy = xs.select(Sinks.zValue(lit(7L), col("x")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(zy == zy.sorted && zy.distinct.size == zy.size)
  }

  test("box-filtered scan of a z-ordered write touches few files") {
    import spark.implicits._
    // 256x256 grid, written in a hash-scrambled order (the unclustered
    // worst case a real ingest produces).
    val grid = spark.range(256L * 256L)
      .select((col("id") % 256).as("x"), (col("id") / 256).as("y"))
      .orderBy(xxhash64(col("id")))
    val dir = Files.createTempDirectory("zorder").toString + "/t"
    Sinks.writeParquetZOrdered(grid, dir, "x", "y", numFiles = 16)
    val back = spark.read.parquet(dir)
    val files = back.select(input_file_name()).distinct().count()
    assert(files == 16L, s"expected 16 files, got $files")
    // A 16x16 box is 1/256 of the plane; its z-values span one 8-bit
    // prefix, so the rows live in one z-run (two with a boundary split).
    val touched = back.where(col("x") < 16 && col("y") < 16)
      .select(input_file_name()).distinct().count()
    assert(touched <= 2,
      s"z-ordered box scan should touch <=2 of 16 files, touched $touched")
    assert(back.count() == 256L * 256L)
  }
}
