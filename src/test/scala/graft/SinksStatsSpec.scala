package graft

import org.apache.spark.sql.functions._

import graft.engine.{Sinks, Tables}

/** ANALYZE TABLE statistics and what the cost-based optimizer does
  * with them: exact row counts in the plan, column stats present, and
  * cardinality estimates that actually SHRINK under selective filters
  * (size-only planning cannot do that — it scales bytes, not rows). */
class SinksStatsSpec extends SparkSpec {

  test("ANALYZE collects row count + column stats; CBO estimates filters from them") {
    val cboWas = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      Sinks.ctas(spark, "stats_orders",
        Tables.orders(spark, sf)
          .select("o_orderkey", "o_orderstatus", "o_totalprice"))
      val exact = spark.table("stats_orders").count()

      // Before ANALYZE: size-only — no row count anywhere.
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val before = spark.table("stats_orders")
        .queryExecution.optimizedPlan.stats
      assert(before.rowCount.isEmpty,
        s"expected no rowCount before ANALYZE, got $before")

      Sinks.analyze(spark, "stats_orders",
        columns = Seq("o_orderstatus", "o_totalprice"))

      // Catalog carries the exact row count and per-column stats.
      val cat = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("stats_orders"))
      val stats = cat.stats.get
      assert(stats.rowCount.contains(BigInt(exact)))
      assert(stats.colStats.contains("o_orderstatus") &&
        stats.colStats("o_orderstatus").distinctCount.isDefined)

      // The optimized plan sees the exact row count...
      val full = spark.table("stats_orders")
        .queryExecution.optimizedPlan.stats
      assert(full.rowCount.contains(BigInt(exact)),
        s"plan rowCount $full != table count $exact")
      // ...and a selective equality filter SHRINKS the estimate using
      // the column's distinct count (≈ N/ndv, never the full N).
      val filtered = spark.table("stats_orders")
        .filter(col("o_orderstatus") === "F")
        .queryExecution.optimizedPlan.stats
      val est = filtered.rowCount
      assert(est.isDefined && est.get > 0 && est.get < BigInt(exact),
        s"expected 0 < estimate < $exact from column stats, got $filtered")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", cboWas)
      spark.sql("DROP TABLE IF EXISTS stats_orders")
    }
  }
}
