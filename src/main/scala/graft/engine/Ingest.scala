package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{StringType, StructType}

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

  /** JSONL (one JSON object per line — the training-data interchange
    * format) scan with a pinned schema. Never rely on Spark's schema
    * inference at scale: it runs a whole extra pass over the data and
    * infers per-batch types that drift between ingests; a declared
    * schema makes the scan single-pass and the types stable. JSONL
    * splits by line, so one big file still fans out across tasks. */
  def readJsonl(spark: SparkSession, paths: Seq[String],
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(paths: _*)

  /** Corrupt-tolerant JSONL scan — the [[readCsvPermissive]] quarantine
    * pattern for the LLM corpus interchange format: PERMISSIVE parse,
    * unparseable lines captured verbatim in [[CorruptCol]] (typed
    * columns null for that row), split downstream with [[clean]] /
    * [[quarantine]]. Web-scale JSONL always contains mangled lines;
    * this keeps the pipeline running AND the evidence queryable.
    * Cached + release-registered for the same two-consumer reasons as
    * the CSV path. */
  def readJsonlPermissive(spark: SparkSession, paths: Seq[String],
      schema: StructType): DataFrame = {
    val withCorrupt = schema.add(CorruptCol, StringType)
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(paths: _*)
      .cache()
      .transform(Caches.track)
  }

  /** ORC scan — columnar like parquet (pruning + predicate pushdown via
    * stripe statistics), for interop with ORC-standardized warehouses. */
  def readOrc(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.orc(paths: _*)

  /** XML scan (Spark 4's built-in source, `rowTag` elements as rows).
    * Schema is EXPLICIT, never inferred: inference costs an extra full
    * pass at scale and can mis-type text that happens to look numeric —
    * the same contract as [[readJsonl]].
    *
    * `ignoreSurroundingSpaces` DEFAULTS to disabled here: Spark 4
    * defaults it to true, which silently TRIMS leading/trailing
    * whitespace in string values on read — breaking the "arbitrary
    * TEXT round-trips" contract of [[Sinks.writeXml]] for
    * whitespace-padded corpora (' padded ' would read back as 'padded'
    * and diverge from any byte-exact oracle). Third-party
    * pretty-printed XML (values indented on their own lines) is the
    * case the default is wrong for — such feeds pass
    * `trimSurroundingSpaces = true` to opt back into Spark's trimming
    * (review finding: the round-trip-safe value was hardcoded).
    * Null-vs-empty semantics are pinned by IngestSpec: an absent
    * element reads as SQL NULL, a present-but-empty element (`<t/>` /
    * `<t></t>`) reads as the empty string — the writer emits nulls as
    * absent elements, so both round-trip. */
  def readXml(spark: SparkSession, paths: Seq[String], schema: StructType,
      rowTag: String = "row", trimSurroundingSpaces: Boolean = false): DataFrame =
    spark.read.schema(schema).format("xml").option("rowTag", rowTag)
      .option("ignoreSurroundingSpaces", trimSurroundingSpaces.toString)
      .load(paths: _*)

  /** Schema-evolution parquet scan: one logical table over batches
    * written with DIFFERENT (widening) schemas — the lakehouse reality
    * where a column was added mid-history. `mergeSchema` unions the
    * footer schemas at plan time and older files surface the missing
    * columns as nulls; Spark's default skips the footer union (it reads
    * one footer for speed), silently pinning the oldest layout, so the
    * option is explicit here. Column pruning and filter pushdown still
    * apply per file. */
  def readParquetMerged(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** A9/scale — dynamic-partition-pruned fact scan: aggregate a
    * month-partitioned fact directory for one quarter, where the months
    * to read are decided AT RUNTIME from a dimension filter rather than
    * spelled as a static `IN` list.
    *
    * The shape that matters at 100 TB: the fact is laid out
    * `partitionBy(ship_month)` ([[Sinks.writeParquet]]), the quarter→
    * months mapping lives only in the (broadcast) dim, and Spark's
    * dynamic partition pruning turns the dim-side filter into a runtime
    * `dynamicpruning` partition filter on the fact scan — the scan reads
    * 3 of 12 directories without the query author enumerating months.
    * This is the mechanism that makes "join fact to a filtered dim"
    * cost dim-selectivity × fact instead of full-fact; asserted on the
    * executed plan in PlanSpec (the scan's partition filters carry a
    * `dynamicpruning` subquery and the post-run `numFiles` confirms the
    * skipped directories were never opened).
    *
    * The dim here is derived (month→quarter arithmetic over a 12-row
    * range) to keep the demo self-contained; any real dim table with a
    * selective predicate plans identically. */
  def dppQuarterAgg(spark: SparkSession, factPath: String,
      quarter: Int): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, count, lit}
    require(quarter >= 1 && quarter <= 4, s"quarter must be 1..4, got $quarter")
    // Integer DIV, spelled as such: `/` on longs is double division in
    // Spark and only lands on the right answer via cast-truncation.
    val dim = spark.range(1, 13).select(
      col("id").cast("int").as("ship_month"),
      expr("CAST((id - 1) DIV 3 + 1 AS INT)").as("quarter"))
    spark.read.parquet(factPath)
      .join(broadcast(dim.filter(col("quarter") === quarter)), "ship_month")
      .groupBy("ship_month")
      .agg(count(lit(1)).as("n"),
        Aggregates.sumExact(col("l_quantity")).as("qty_sum"))
  }

  /** Name of the quarantine column carried by [[readCsvPermissive]]. */
  val CorruptCol = "_corrupt_record"

  /** Corrupt-tolerant CSV scan: PERMISSIVE parse with the raw text of any
    * unparseable line captured in [[CorruptCol]] (typed columns null for
    * that row). At 100 TB a single mangled line must neither kill the job
    * (FAILFAST) nor vanish silently (DROPMALFORMED) — quarantine keeps
    * the pipeline running AND the evidence queryable.
    *
    * The frame is cached before returning: Spark disallows queries whose
    * referenced columns are ONLY the internal corrupt-record column on a
    * raw scan (the parser would have to re-run per consumer with
    * divergent results), and the [[quarantine]] split needs exactly that
    * query shape. Caching also means the (expensive) permissive parse
    * runs once for both halves of the split. */
  def readCsvPermissive(spark: SparkSession, paths: Seq[String],
      schema: StructType, header: Boolean = true): DataFrame = {
    val withCorrupt = schema.add(CorruptCol, StringType)
    spark.read
      .schema(withCorrupt)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(paths: _*)
      .cache()
      // Registered for deferred release like every operator-internal
      // cache — the clean/quarantine consumers run on the caller's
      // schedule, so the caller's post-action Caches.release() is the
      // lifecycle hook.
      .transform(Caches.track)
  }

  /** Rows that parsed cleanly, without the quarantine column. */
  def clean(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The raw text of every line that failed the schema — route to a bad-
    * records sink for triage/replay. */
  def quarantine(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull).select(CorruptCol)
}
