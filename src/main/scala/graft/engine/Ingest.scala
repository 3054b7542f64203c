package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** A1 — multi-file CSV ingest with an explicit schema and a column
  * whitelist, the reference's sole entry point
  * (`/root/reference/src/data_cleaning.py:15-25,90-93`: glob of
  * `2025_0[1-3].csv`, `usecols` keeping 28 of hundreds of columns).
  *
  * Spark-first restatement: one multi-path scan with a declared
  * `StructType` (deterministic types — the reference lets pandas infer;
  * see SURVEY.md §1.2 for why explicit wins), header handling on the
  * reader, and the whitelist as a `select` that Catalyst pushes into the
  * scan — the CSV reader then only parses the projected columns
  * (`ReadSchema` in the explain shows the pruned list), the columnar
  * analog of `usecols`. The reference's per-file loop disappears: a
  * multi-path scan plans one job over all files, each file splitting into
  * tasks independently, which is what makes 2 GB+ (or 100 TB) of CSV a
  * non-event. */
object Ingest {

  /** Multi-file CSV scan: explicit schema, header-aware, optional column
    * whitelist (empty = keep all). */
  def readCsv(spark: SparkSession, paths: Seq[String], schema: StructType,
      header: Boolean = true, keepCols: Seq[String] = Nil): DataFrame = {
    val df = spark.read
      .schema(schema)
      .option("header", header.toString)
      .csv(paths: _*)
    if (keepCols.nonEmpty) df.select(keepCols.map(col): _*) else df
  }
}
