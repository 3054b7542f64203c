package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver test star schema (`TESTDATA.md`), which plays the
  * structural roles of the reference's flight star schema (see `FIXTURES.md`):
  * `lineitem`+`orders` = fact_flights, `supplier` = dim_airlines,
  * `nation` (role-playing via customer/supplier) = dim_airports,
  * derived calendar over `o_orderdate` = dim_calendar.
  *
  * All loads are plain parquet scans: Catalyst pushes projections and
  * predicates into the scan (column pruning + row-group min/max skipping),
  * which at 100 TB is the difference between reading TBs and reading GBs —
  * callers should `.select`/`.filter` early and let the optimizer do the rest.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: parquet INT64 TIMESTAMP(NANOS) (older pandas writer — Spark
    * rejects it unless read as raw nanos via the legacy flag) and plain
    * `timestamp[us]` (current writer — Spark reads it natively as
    * TIMESTAMP_NTZ). The loader must work against either, so it branches on
    * the schema it actually loaded rather than assuming one encoding:
    * LongType → nanos→micros with integer division (a double intermediate
    * would lose precision at 1e18 nanos); TIMESTAMP_NTZ → cast to the
    * session-TZ timestamp the event tier was built against (value-preserving
    * under the engine's fixed UTC session zone, `Sessions.scala:32`);
    * TIMESTAMP → pass through. The legacy nanos flag is only set when the
    * native read fails on NANOS, so it is not a session-wide side effect for
    * directories that don't need it. */
  def events(s: SparkSession, d: String): DataFrame = {
    // Walk the cause chain: the illegal-Parquet-type error can arrive
    // wrapped (driver-side analysis vs task-side read), and the outer
    // message may not carry the type name.
    def mentionsNanos(t: Throwable): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .exists(c => String.valueOf(c.getMessage).contains("NANOS"))
    val raw =
      try table(s, d, "events")
      catch {
        case e: Exception if mentionsNanos(e) =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          table(s, d, "events")
      }
    normalizeEventTs(raw)
  }

  /** Normalize an events frame's `ts` column to session-TZ TimestampType
    * regardless of which physical encoding it was loaded from. Exposed (and
    * spec'd per-branch in TablesSpec) so a future testdata regeneration that
    * flips the encoding again cannot silently break the event tier. */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType           => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampNTZType   => df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType      => df
    case other              =>
      throw new IllegalArgumentException(s"unsupported events.ts encoding: $other")
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
