package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.{Ingest, Sinks}

/** A1/A4/A5 unit coverage: multi-file CSV ingest with explicit schema +
  * column whitelist, and sink round-trips, on in-test fixtures. */
class IngestSpec extends SparkSpec {

  private def writeFixture(dir: Path, name: String, lines: String*): Unit =
    Files.writeString(dir.resolve(name), lines.mkString("\n") + "\n")

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("qty", DoubleType),
    StructField("day", DateType)))

  test("multi-file CSV scan: explicit schema, header, usecols whitelist") {
    val dir = Files.createTempDirectory("graft-ingest")
    writeFixture(dir, "a.csv",
      "id,name,qty,day", "1,alpha,1.5,2025-01-01", "2,beta,2.25,2025-01-02")
    writeFixture(dir, "b.csv",
      "id,name,qty,day", "3,gamma,0.125,2025-02-03")
    val df = Ingest.readCsv(spark,
      Seq(dir.resolve("a.csv").toString, dir.resolve("b.csv").toString),
      schema, keepCols = Seq("id", "qty", "day"))
    assert(df.columns.toSeq == Seq("id", "qty", "day"))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(1).getLong(0) == 2L && rows(1).getDouble(1) == 2.25)
    assert(rows(2).getDate(2).toString == "2025-02-03")
  }

  test("parquet sink: overwrite then append with partition layout") {
    import spark.implicits._
    val path = s"${Sinks.scratch}/ingest-spec-parquet"
    val first = Seq((1L, 1, "a"), (2L, 1, "b")).toDF("id", "month", "v")
    val second = Seq((3L, 2, "c")).toDF("id", "month", "v")
    Sinks.writeParquet(first, path, "overwrite", Seq("month"))
    Sinks.writeParquet(second, path, "append", Seq("month"))
    val back = spark.read.parquet(path)
    assert(back.count() == 3)
    // Partition pruning: a month filter must prune to one partition dir.
    val pruned = back.filter(col("month") === 2)
    assert(pruned.count() == 1)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("month"))
    // Overwrite replaces prior contents.
    Sinks.writeParquet(second, path, "overwrite", Seq("month"))
    assert(spark.read.parquet(path).count() == 1)
  }

  test("partitioned parquet write emits one file per partition value (no small-file storm)") {
    import spark.implicits._
    val path = s"${Sinks.scratch}/ingest-spec-onefile"
    // Rows of each month spread over many input partitions: without the
    // sink's repartition, each of them would write its own file per dir.
    val df = (1 to 200).map(i => (i.toLong, i % 4, s"v$i"))
      .toDF("id", "month", "v").repartition(16)
    Sinks.writeParquet(df, path, "overwrite", Seq("month"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 until 4).foreach { m =>
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/month=$m"))
        .filter(_.getPath.getName.endsWith(".parquet"))
      assert(files.length == 1,
        s"month=$m has ${files.length} files; expected 1")
    }
    assert(spark.read.parquet(path).count() == 200)
    // Salted variant bounds files at filesPerPartition while restoring
    // write parallelism for oversized partition values.
    Sinks.writeParquet(df, path, "overwrite", Seq("month"), filesPerPartition = 3)
    (0 until 4).foreach { m =>
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/month=$m"))
        .filter(_.getPath.getName.endsWith(".parquet"))
      assert(files.length <= 3 && files.length >= 1)
    }
    assert(spark.read.parquet(path).count() == 200)
  }

  test("permissive CSV ingest quarantines malformed rows instead of dying or dropping") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-badcsv")
    val f = dir.resolve("part1.csv")
    java.nio.file.Files.writeString(f,
      """id,qty,name
        |1,10,alpha
        |2,notanumber,beta
        |3,30,gamma
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", IntegerType),
      StructField("name", StringType)))
    val parsed = Ingest.readCsvPermissive(spark, Seq(f.toString), schema)
    val good = Ingest.clean(parsed)
    val bad = Ingest.quarantine(parsed)
    assert(good.count() == 2)
    assert(good.filter(col("id") === 2L).count() == 0)
    assert(bad.count() == 1)
    // The quarantined line is the raw text, evidence intact.
    assert(bad.head().getString(0).contains("notanumber"))
    parsed.unpersist()
  }

  test("JSONL round-trips hostile strings; ORC pushes predicates to the scan") {
    import spark.implicits._
    // Newlines, quotes, unicode: JSON escaping must keep line == record.
    val hostile = Seq((1L, "line1\nline2"), (2L, "quote \" and \\ slash"),
      (3L, "naïve 中文 👍")).toDF("id", "text")
    val jpath = s"${Sinks.scratch}/ingest-spec-jsonl"
    Sinks.writeJsonl(hostile, jpath)
    val jback = Ingest.readJsonl(spark, Seq(jpath), hostile.schema)
    assert(jback.count() == 3)
    assert(jback.except(hostile).count() == 0)
    assert(hostile.except(jback).count() == 0)

    val opath = s"${Sinks.scratch}/ingest-spec-orc"
    Sinks.writeOrc(hostile, opath)
    val oback = Ingest.readOrc(spark, Seq(opath)).filter(col("id") === 2L)
    assert(oback.count() == 1)
    val plan = oback.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(id,2)"),
      s"ORC scan did not receive the pushed filter:\n$plan")
  }

  test("CSV sink round-trips exactly, including doubles") {
    import spark.implicits._
    val path = s"${Sinks.scratch}/ingest-spec-csv"
    val out = Seq((1L, "x", 0.1), (2L, "y", 12345.6789)).toDF("id", "k", "v")
    Sinks.writeCsv(out, path)
    val back = Ingest.readCsv(spark, Seq(path), StructType(Seq(
      StructField("id", LongType), StructField("k", StringType),
      StructField("v", DoubleType))))
    assert(back.orderBy("id").collect().map(_.getDouble(2)).toSeq ==
      Seq(0.1, 12345.6789))
  }

  test("permissive JSONL quarantines mangled lines and keeps clean ones typed") {
    import org.apache.spark.sql.types._
    val dir = s"${graft.engine.Sinks.scratch}/jsonl_permissive_test"
    new java.io.File(dir).mkdirs()
    val f = new java.io.PrintWriter(s"$dir/part.jsonl")
    f.println("""{"doc_id": 1, "text": "good line"}""")
    f.println("""{"doc_id": 2, "text": "also fine"}""")
    f.println("""{"doc_id": 3, "text": "truncated""")   // mangled JSON
    f.println("""not json at all""")
    f.close()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val df = Ingest.readJsonlPermissive(spark, Seq(dir), schema)
    assert(Ingest.clean(df).count() == 2)
    val quarantined = Ingest.quarantine(df).collect().map(_.getString(0))
    assert(quarantined.length == 2)
    assert(quarantined.exists(_.contains("truncated")) &&
      quarantined.contains("not json at all"),
      s"quarantine must keep the raw evidence: ${quarantined.toSeq}")
    graft.engine.Caches.release()
  }

  test("XML round-trips markup-hostile strings and nulls exactly") {
    import spark.implicits._
    val dir = s"${graft.engine.Sinks.scratch}/xml_roundtrip_test"
    // Values the XML writer must escape to survive: tags, ampersands,
    // quotes, newlines; plus a null (round-trips as an absent element)
    // and a zero (must not be confused with null by the reader).
    val rows = Seq(
      (1L, "<b>bold</b> & \"quoted\" 'txt'", Some(10L)),
      (2L, "line1\nline2", None),
      (3L, "plain", Some(0L)))
    val df = rows.toDF("id", "text", "n")
      .select(col("id"), col("text"), col("n").cast("long"))
    graft.engine.Sinks.writeXml(df, dir, rowTag = "r")
    val back = Ingest.readXml(spark, Seq(dir),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id LONG, text STRING, n LONG"), rowTag = "r")
      .collect().map(r => (r.getLong(0),
        r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(_._1).toSeq
    assert(back == rows.map(t => (t._1, t._2, t._3)))
    // XML 1.0 cannot represent control chars below 0x20 (except
    // tab/newline/CR): the write must FAIL LOUDLY (probed: the Woodstox
    // writer throws), never silently corrupt or strip — the documented
    // scrub-upstream contract.
    val ctrl = Seq((9L, "bad" + 1.toChar + "byte")).toDF("id", "text")
    assertThrows[org.apache.spark.SparkException] {
      graft.engine.Sinks.writeXml(ctrl, s"$dir-ctrl", rowTag = "r")
    }
  }

  test("XML round-trips whitespace padding and distinguishes empty from null") {
    import spark.implicits._
    val dir = s"${graft.engine.Sinks.scratch}/xml_ws_roundtrip_test"
    // Spark 4's XML reader defaults ignoreSurroundingSpaces=true, which
    // silently trims ' padded ' to 'padded' — readXml force-disables it
    // (review finding). Pinned semantics: null writes as an ABSENT
    // element and reads back as NULL; the empty string writes as an
    // empty element and reads back as '' (not null).
    val rows = Seq(
      (1L, Some("  padded  ")),
      (2L, Some("\ttab-led and trailing ")),
      (3L, Some("")),
      (4L, None: Option[String]))
    val df = rows.toDF("id", "text")
    graft.engine.Sinks.writeXml(df, dir, rowTag = "r")
    val back = Ingest.readXml(spark, Seq(dir),
      org.apache.spark.sql.types.StructType.fromDDL("id LONG, text STRING"),
      rowTag = "r")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getString(1))))
      .sortBy(_._1).toSeq
    assert(back == rows,
      s"whitespace/empty/null must round-trip byte-exactly: $back")
  }
}
