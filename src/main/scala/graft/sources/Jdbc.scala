package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Sinks

/** The reference's real ingest/sink boundary is a SQL database
  * (SURVEY.md §2.A2/A4): chunked `read_sql` ingest
  * (`/root/reference/src/aggregate_flight_data.py:25`) and chunked
  * `to_sql` writes with first-chunk-replace / rest-append semantics
  * (`/root/reference/src/data_cleaning.py:108-116`). This is that
  * boundary Spark-first, over `spark.read.jdbc` / `DataFrameWriter.jdbc`:
  *
  *  - **A2 read**: the reference's `chunksize` loop becomes a PARTITIONED
  *    jdbc scan — `numPartitions` tasks each issue a range predicate on
  *    `partitionColumn` (`WHERE col >= lo AND col < hi`), so the read is
  *    parallel across executors instead of a single serial cursor, and
  *    Catalyst additionally pushes projections and filters into each
  *    task's query. `numPartitions` bounds the concurrent connections the
  *    database sees — at scale, size it to what the DB tolerates, not to
  *    the cluster's core count.
  *  - **A4 write**: the reference's `chunksize=10000` becomes the jdbc
  *    `batchsize` (rows per `executeBatch`), and `if_exists=
  *    'replace'|'append'` maps onto `SaveMode.Overwrite|Append` — with
  *    one semantic upgrade: the reference replaces on the FIRST chunk and
  *    appends the rest by hand; Spark's single `mode("overwrite")` write
  *    is the same outcome without the client-side loop, and each write
  *    task batches independently.
  *
  * Tests drive the full surface against an embedded Derby database (the
  * JDBC engine Spark itself ships for its Hive metastore), so the code
  * path is real end-to-end: DDL via dialect type mapping, batched
  * inserts, partitioned range reads. Swapping the url/driver for MySQL
  * (the reference's engine) changes no call sites.
  */
object Jdbc {

  /** Derby's boot writes `derby.log` to `derby.system.home` (default:
    * the process cwd) — pin it to scratch before the first connection. */
  private def ensureDerbyHome(): Unit =
    if (!sys.props.contains("derby.system.home")) {
      val dir = new java.io.File(Sinks.scratch)
      dir.mkdirs()
      sys.props("derby.system.home") = dir.getAbsolutePath
    }

  /** Embedded Derby url (in-memory, created on first touch) — the
    * sandbox's stand-in for the reference's MySQL endpoint. */
  def derbyMemUrl(db: String): String = {
    ensureDerbyHome()
    s"jdbc:derby:memory:$db;create=true"
  }

  def derbyProps(extra: (String, String)*): Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** A2 — single-cursor read (small tables / dimension lookups). */
  def read(spark: SparkSession, url: String, table: String,
      props: Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** A2 — chunked/partitioned read: `numPartitions` parallel range
    * cursors on `partitionColumn` ∈ [lower, upper]. Rows outside the
    * bounds are still read (the first and last strides are unbounded);
    * the bounds only shape the stride boundaries. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int, props: Properties): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper,
      numPartitions, props)

  /** A4 — batched sink; `mode` ∈ overwrite|append
    * (= the reference's `if_exists` replace|append). `columnTypes` is the
    * jdbc `createTableColumnTypes` DDL fragment for dialects whose default
    * string mapping is unqueryable (Derby maps StringType → CLOB, which
    * rejects comparisons — pin VARCHAR: `"name VARCHAR(128)"`). */
  def write(df: DataFrame, url: String, table: String, mode: String,
      props: Properties, batchSize: Int = 10000,
      columnTypes: Option[String] = None): Unit = {
    val w = df.write.mode(mode).option("batchsize", batchSize.toString)
    columnTypes.foreach(t => w.option("createTableColumnTypes", t))
    w.jdbc(url, table, props)
  }

  /** [[write]] with every string column pinned to `VARCHAR(maxLen)` —
    * the portable default for analytics tables (CLOB-free on Derby,
    * index-friendly everywhere). */
  def writeVarchar(df: DataFrame, url: String, table: String, mode: String,
      props: Properties, batchSize: Int = 10000,
      maxLen: Int = 1024): Unit = {
    val strCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR($maxLen)")
    write(df, url, table, mode, props, batchSize,
      if (strCols.isEmpty) None else Some(strCols.mkString(", ")))
  }
}
