package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

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
  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS) (written by pandas),
    * which Spark's reader rejects by default; read it as raw nanos via the
    * legacy flag and convert with integer division (a double intermediate
    * would lose precision at 1e18 nanos). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events").withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
