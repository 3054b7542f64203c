package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The reference's write surface (SURVEY.md §2.A4/A5/A7), Spark-first.
  *
  *  - A4: chunked batch DB sink with replace/append modes
  *    (`/root/reference/src/data_cleaning.py:108-116` — first file
  *    `if_exists='replace'`, the rest `'append'`). Here: parquet writes
  *    with `mode(overwrite|append)`; the reference's `chunksize=10000`
  *    batching is Spark task-level row-group writing, free. The
  *    `partitionBy("month")` layout is the physical-design analog of the
  *    reference's B-tree indexes (`/root/reference/sql/data_modeling.sql:78-80`)
  *    — month-pruned scans skip whole directories, and parquet row-group
  *    min/max stats replace the index lookup (SURVEY.md §2.A9).
  *  - A5: CSV sink with header and no index column
  *    (`/root/reference/src/aggregate_flight_data.py:42,79`). `coalesce(1)`
  *    reproduces the single-file cache shape the dashboard re-reads; drop
  *    it for large outputs.
  *  - A7: CTAS materialization
  *    (`/root/reference/sql/data_modeling.sql:3-16,52-74`) via
  *    `saveAsTable` against the session catalog.
  */
object Sinks {

  /** Scratch root for sink round-trips (tests, verify queries). */
  def scratch: String =
    sys.env.getOrElse("GRAFT_SCRATCH",
      s"${sys.props("java.io.tmpdir")}/graft-scratch")

  /** A4 — batch parquet sink; `mode` ∈ overwrite|append, optional
    * partition layout (e.g. `Seq("month")`).
    *
    * Partitioned writes repartition on the partition columns first —
    * without it every upstream task writes a file into every partition
    * directory (tasks × partitions files; at cluster scale a small-file
    * storm that throttles the namenode and every later scan). One shuffle
    * buys one file per partition value. When a single partition value is
    * too big for one writer task, `filesPerPartition > 1` adds a
    * deterministic row-hash salt to the repartition key, bounding file
    * count at `values × filesPerPartition` while restoring write
    * parallelism. */
  def writeParquet(df: DataFrame, path: String, mode: String,
      partitionCols: Seq[String] = Nil, filesPerPartition: Int = 1): Unit = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    require(filesPerPartition >= 1)
    val repartitioned =
      if (partitionCols.isEmpty) df
      else {
        val keys = partitionCols.map(col)
        val parts =
          if (filesPerPartition == 1) keys
          else {
            val rest = df.columns.filterNot(partitionCols.contains).map(col)
            keys :+ pmod(xxhash64(rest.toIndexedSeq: _*), lit(filesPerPartition))
          }
        df.repartition(parts: _*)
      }
    val w = repartitioned.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Dynamic-partition overwrite: replace ONLY the partition directories
    * present in `df`, leaving every other partition's files untouched.
    * Spark's default (static) overwrite mode deletes the WHOLE table root
    * before writing — on a 100 TB month-partitioned fact, refreshing one
    * late-arriving month must rewrite one directory, not the table; this
    * is the idempotent-backfill primitive every partitioned lakehouse
    * pipeline is built on. The mode is set per-write via the DataFrameWriter
    * option (not session-wide — a global flag silently changes the
    * semantics of every other overwrite in the session). Same small-file
    * discipline as [[writeParquet]]: repartition on the partition key
    * first. */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    require(partitionCols.nonEmpty, "dynamic overwrite needs partition columns")
    df.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** JSONL sink (Spark's json writer is one object per line). Text fields
    * with newlines/unicode are JSON-escaped, so the line = record
    * invariant holds for any content. */
  def writeJsonl(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** ORC sink — same columnar properties as parquet (see [[writeParquet]]),
    * for ORC-standardized consumers. */
  def writeOrc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)

  /** XML sink (Spark 4's built-in XML source): one `rowTag` element per
    * record, one file per partition (every writer busy — row-oriented
    * like JSONL, for feed/interchange consumers that speak XML). The
    * writer escapes markup in values, so arbitrary TEXT round-trips —
    * but XML 1.0 cannot represent control characters below 0x20 (other
    * than tab/newline/CR), and the write FAILS LOUDLY on them
    * (`WstxIOException`, probed + pinned in IngestSpec) rather than
    * silently corrupting; scrub such bytes upstream (the PII/quality
    * tier) before routing a corpus through an XML interchange. */
  def writeXml(df: DataFrame, path: String, mode: String = "overwrite",
      rowTag: String = "row"): Unit =
    df.write.mode(mode).format("xml").option("rowTag", rowTag).save(path)

  /** A5 — headered CSV sink, single file like the reference's cache CSVs
    * (`aggregate_flight_data.py:42` writes one `to_csv` file). The
    * `coalesce(1)` single-writer is the FIDELITY twin only — it
    * serializes the entire output through one task, so anything not
    * required to be one file belongs on [[writeCsvParallel]]. */
  def writeCsv(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.coalesce(1).write.mode(mode).option("header", "true").csv(path)

  /** Parallel headered CSV sink — one file per partition, every writer
    * busy, the default for any consumer that can read a directory (all
    * of Spark/DuckDB/pandas can). At 100 TB a single-writer CSV is an
    * hours-long serial tail; this is the same writer fan-out as the
    * parquet sink. */
  def writeCsvParallel(df: DataFrame, path: String,
      mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** A7 — CTAS: materialize a DataFrame as a catalog table (parquet under
    * the session warehouse dir). Re-runnable like the reference's
    * `CREATE TABLE IF NOT EXISTS`: a stale location from a previous
    * session (the in-memory catalog forgets tables but the filesystem
    * doesn't) is dropped before the write. */
  def ctas(spark: SparkSession, table: String, df: DataFrame): Unit =
    ctasWith(spark, table, df)(identity)

  /** Write with a TARGET FILE SIZE instead of a file count — the
    * proactive answer to the small-files problem that [[compact]]
    * solves after the fact. The optimizer's size estimate for the
    * frame (`optimizedPlan.stats.sizeInBytes`) picks the partition
    * count as `ceil(bytes / (ratio · targetBytes))`, so a 100 TB write
    * lands as ~targetBytes files regardless of the upstream
    * parallelism (a 32 000-task shuffle does not become 32 000 files),
    * and a tiny dimension write collapses to ONE file instead of
    * one-per-task.
    *
    * `outputRatio` converts ESTIMATE bytes to OUTPUT bytes. For
    * file-scan lineage the estimate is already compressed on-disk
    * bytes, so the parquet→parquet default of 1.0 is right; raise it
    * when the input representation is fatter than the parquet output
    * (e.g. ~4 for uncompressed in-memory rows or text inputs). Sources
    * that report NO real size (JDBC relations, RDD-backed frames carry
    * the `defaultSizeInBytes` = Long.MaxValue sentinel) would
    * otherwise clamp to the max and write a 100 000-small-file storm —
    * exactly what this helper exists to prevent — so any plan whose
    * LEAVES include a sentinel-valued relation falls back to the
    * frame's existing partitioning, unrepartitioned (leaf-level
    * detection, so an honest-but-huge join-product estimate still
    * takes the sizing path — with the sizing basis clamped to 1024×
    * the leaf bytes, since size-only join estimates multiply child
    * byte counts and can exceed writable reality by orders of
    * magnitude). Returns the chosen file count. */
  def writeParquetSized(df: DataFrame, path: String, mode: String,
      targetBytes: Long, outputRatio: Double = 1.0): Int = {
    require(targetBytes > 0 && outputRatio > 0)
    val plan = df.queryExecution.optimizedPlan
    val planBytes = plan.stats.sizeInBytes
    // Stats-less detection happens at the LEAVES, not by plan-total
    // magnitude: a source with no real size signal (JDBC relation,
    // RDD-backed frame) reports `spark.sql.defaultSizeInBytes`
    // (Long.MaxValue unless overridden) from its leaf and poisons the
    // sum, while a legitimately huge ESTIMATE (a join product of real
    // file stats) has honest leaves and must still get the sizing this
    // helper promises — a magnitude threshold on the total
    // misclassified that case as stats-less.
    val defaultSize = BigInt(df.sparkSession.conf
      .get("spark.sql.defaultSizeInBytes", Long.MaxValue.toString).toLong)
    val leaves = plan.collectLeaves()
    // A leaf has no usable size signal when it reports EXACTLY the
    // defaultSizeInBytes sentinel (JDBC, RDD-backed — equality, not
    // magnitude, so a deployment that tunes that conf DOWN to let
    // JDBC tables broadcast doesn't get honest large parquet leaves
    // misread), OR when it carries a physically impossible estimate
    // (an unmaterialized InMemoryRelation over join-product lineage
    // reports its child plan's multiplied stats — no real single leaf
    // holds an exbibyte, so >= 2^60 is garbage regardless of conf).
    val statsLess = leaves.exists { l =>
      val s = l.stats.sizeInBytes
      s == defaultSize || s >= BigInt(1L << 60)
    }
    if (statsLess) {
      val n = df.rdd.getNumPartitions.max(1)
      df.write.mode(mode).parquet(path)
      n
    } else {
      // Size-only join estimates MULTIPLY child byte counts (the
      // visitor's output is dimensionally bytes^k, not bytes), so a
      // deep join chain's estimate can exceed any writable reality by
      // orders of magnitude. Clamp the sizing basis to 1024x the leaf
      // bytes — generous for real fan-out joins — so a degenerate
      // estimate degrades to a few oversized files, never a
      // 100000-task repartition of kilobytes.
      val leafSum = leaves.map(_.stats.sizeInBytes).sum.max(1)
      val basis = planBytes.min(leafSum * 1024)
      val est = (BigDecimal(basis) / outputRatio).toBigInt
      val n = ((est + targetBytes - 1) / targetBytes).max(1).min(100000).toInt
      df.repartition(n).write.mode(mode).parquet(path)
      n
    }
  }

  /** Collect table (and optionally column) statistics for the
    * cost-based optimizer — the warehouse maintenance step that turns
    * size-only planning into cardinality-aware planning. Without stats
    * a parquet table exposes only file bytes; with `rowCount` and
    * per-column NDV/min/max/null-count the optimizer estimates
    * post-filter cardinalities (selective predicates shrink the
    * estimated row count, not just the byte count), picks broadcast
    * sides after filters, and (with `spark.sql.cbo.joinReorder`)
    * reorders multi-way joins. At 100 TB this is not optional: a
    * mis-ordered fact⋈fact⋈dim join is the difference between one
    * broadcast and a petabyte shuffle. Asserted in SinksStatsSpec. */
  def analyze(spark: SparkSession, table: String,
      columns: Seq[String] = Nil): Unit = {
    // Quote each name part separately — backticking the whole argument
    // would turn a qualified `db.table` into a one-part name with a
    // dot in it.
    val quoted = table.split('.').map(p => s"`$p`").mkString(".")
    spark.sql(s"ANALYZE TABLE $quoted COMPUTE STATISTICS" +
      (if (columns.isEmpty) ""
       else s" FOR COLUMNS ${columns.map(c => s"`$c`").mkString(", ")}"))
  }

  /** A9 analog — bucketed CTAS: hash-bucket (and sort) the table on its
    * join key so future equi-joins on that key are co-located — both
    * exchanges of a sort-merge join disappear (asserted in PlanSpec).
    * This is the physical-design move that replaces the reference's
    * B-tree indexes (`/root/reference/sql/data_modeling.sql:78-80`) for
    * the fact⋈fact case, alongside `partitionBy` for pruning: at 100 TB,
    * bucketing the fact tables on the order key turns the one genuinely
    * large join in the star schema into a zero-shuffle merge. */
  def ctasBucketed(spark: SparkSession, table: String, df: DataFrame,
      buckets: Int, bucketCol: String): Unit =
    ctasWith(spark, table, df)(
      _.bucketBy(buckets, bucketCol).sortBy(bucketCol))

  /** Z-order (Morton) key: bitwise interleave of two non-negative integer
    * dimensions — x in the even bit positions, y in the odd. Rows close
    * in z are close in BOTH x and y, so range-partitioning files by z
    * gives every file a compact (x, y) bounding box and parquet min/max
    * stats prune on either dimension — the multi-dimensional layout move
    * `partitionBy` (one dimension, directory-granular) cannot make.
    * Pure integer shift/mask arithmetic, codegen'd, bit-identical across
    * engines. Inputs must be in `[0, 2^bits)`; 21+21 bits fills a long's
    * positive range. */
  def zValue(x: Column, y: Column, bits: Int = 21): Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val (xl, yl) = (x.cast("long"), y.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** SQL twin of [[zValue]] (identical shift/mask arithmetic). */
  def zValueSql(x: String, y: String, bits: Int = 21): String =
    (0 until bits).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " | ", ")")

  /** Z-ordered parquet write: range-partition into `numFiles` z-runs and
    * sort within each, so files tile the (x, y) plane in compact boxes.
    * A scan filtered on either (or both) dimensions then skips most files
    * on footer stats alone — asserted file-count-touched in SinksZOrderSpec.
    * The write costs one range exchange (with a sampling pass for the
    * bounds), same as any global sort. */
  def writeParquetZOrdered(df: DataFrame, path: String, xCol: String,
      yCol: String, numFiles: Int, bits: Int = 21): Unit = {
    import org.apache.spark.sql.functions.col
    require(numFiles >= 1)
    df.withColumn("_z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Outcome of [[compactParquet]]: the input/output file counts plus the
    * planned per-bin input-byte totals (packing-bound evidence for specs
    * and operational logs). */
  case class CompactionStats(inputFiles: Int, outputFiles: Int,
      inputBytes: Long, binInputBytes: Seq[Long])

  /** Lakehouse small-file compaction — the maintenance twin of the
    * z-order layout: rewrite a parquet directory whose many small files
    * (streaming micro-batches, over-parallel writes, trickle appends)
    * throttle every later scan, into `ceil(bytes / targetBytes)`-ish
    * right-sized files.
    *
    * Plan: (1) list the directory's data files — namenode metadata, one
    * status per file (~800k entries for 100 TB of 128 MB files: a
    * driver-side planning set in the same bounded-metadata class as
    * every table-maintenance planner); (2) first-fit-decreasing
    * bin-pack the listing to `targetBytes` — no bin exceeds
    * `max(targetBytes, largest file)`, and FFD uses at most ~1.22× the
    * optimal bin count, so output sizes are tight without reading a
    * row; (3) rewrite in ONE Spark job: every row is tagged with its
    * source file's bin via a broadcast file→bin map on
    * `_metadata.file_name`, and one shuffle lands each bin in exactly
    * one write task.
    *
    * The one-task-per-bin placement stays in the DataFrame tier (no
    * RDD hop, no per-bin driver job loop): bins are labeled not 0..B-1
    * but with driver-searched int keys whose Murmur3 hash lands on
    * distinct shuffle partitions, so the standard hash exchange IS the
    * exact placement. Oversize files (> targetBytes) pass through as
    * single-file bins — splitting them is a row-level recluster
    * ([[writeParquetZOrdered]]'s job), not compaction's.
    *
    * Copy-based by design: the compacted directory is written to
    * `outPath` and the input is left untouched — atomic swap of live
    * table data is a commit-protocol/table-format concern, not a
    * rewrite concern. */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): CompactionStats = {
    import org.apache.spark.sql.functions.{broadcast, col}
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val in = new org.apache.hadoop.fs.Path(inPath)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(in).toSeq
      .filter(st => st.isFile && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
      .map(st => (st.getPath.getName, st.getLen))
    require(files.nonEmpty, s"no data files under $inPath")

    // First-fit-decreasing, deterministic (size desc, name asc).
    val bins = collection.mutable.ArrayBuffer.empty[(Long, List[String])]
    files.sortBy { case (name, len) => (-len, name) }
      .foreach { case (name, len) =>
        bins.indexWhere { case (used, _) => used + len <= targetBytes } match {
          case -1 => bins += ((len, List(name)))
          case i  => val (used, names) = bins(i)
                     bins(i) = (used + len, name :: names)
        }
      }
    val nBins = bins.size

    // For each bin j, the smallest int key whose Murmur3(seed 42) hash —
    // the exact function behind HashPartitioning — lands pmod-style on
    // partition j of an nBins-way exchange. Expected O(B ln B) probes.
    val keyOf = Array.fill(nBins)(-1)
    var k = 0
    var found = 0
    while (found < nBins) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(k, 42)
      val j = ((h % nBins) + nBins) % nBins
      if (keyOf(j) == -1) { keyOf(j) = k; found += 1 }
      k += 1
    }
    val fileKey = bins.zipWithIndex.flatMap { case ((_, names), j) =>
      names.map(n => (n, keyOf(j)))
    }.toSeq

    val keyMap = spark.createDataFrame(fileKey).toDF("_fn", "_ck")
    val data = spark.read.parquet(inPath)
    data.select(col("*"), col("_metadata.file_name").as("_fn"))
      .join(broadcast(keyMap), "_fn")
      .repartition(nBins, col("_ck"))
      .drop("_fn", "_ck")
      .write.mode("overwrite").parquet(outPath)

    CompactionStats(files.size, nBins, files.map(_._2).sum,
      bins.map(_._1).toSeq)
  }

  private def ctasWith(spark: SparkSession, table: String, df: DataFrame)(
      f: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] =>
         org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    f(df.write.mode("overwrite").format("parquet")).saveAsTable(table)
  }
}
