package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{StarSchema, Tables}
import graft.operators.Similarity

/** Physical-plan shape assertions — the scale properties the operators
  * promise (broadcast dims, pruning/pushdown into the scan, partial
  * aggregation, no nested-loop joins) locked in as tests so a plan
  * regression fails CI rather than a 100 TB run. */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String = {
    // Cached plan fragments from other suites would substitute
    // InMemoryRelation for the scans these assertions inspect.
    spark.catalog.clearCache()
    df.collect() // let AQE finalize so the string shows executed joins
    df.queryExecution.executedPlan.toString
  }

  test("wide view: every dim join is a broadcast hash join, no shuffles for dims") {
    val p = plan(StarSchema.wideView(spark, sf).limit(1))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"expected >=4 broadcast dim joins in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("column pruning reaches the lineitem scan") {
    // A 2-column projection must not read measure columns.
    val df = StarSchema.wideView(spark, sf).select("month", "airline_name")
    val p = plan(df.limit(1))
    val lineitemScan = p.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("lineitem"))
      .mkString("\n")
    assert(lineitemScan.nonEmpty)
    assert(!lineitemScan.contains("l_extendedprice") && !lineitemScan.contains("l_quantity"),
      s"measure columns not pruned from scan: $lineitemScan")
  }

  test("filter pushdown reaches the parquet scan") {
    val df = Tables.lineitem(spark, sf).filter(col("l_quantity") > 40)
      .select("l_orderkey")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]") ||
      p.contains("GreaterThan(l_quantity,40"),
      s"filter not pushed into scan:\n$p")
  }

  test("embedding near-dup runs as a partitioned equi-join, never a nested loop") {
    val df = Similarity.nearDupPairs(Tables.embeddings(spark, sf), threshold = 0.4)
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"quadratic join shape leaked into the plan:\n$p")
  }

  test("bucketed CTAS joins without any exchange (co-located fact join)") {
    import graft.engine.Sinks
    Sinks.ctasBucketed(spark, "graft_li_b",
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      buckets = 8, bucketCol = "l_orderkey")
    Sinks.ctasBucketed(spark, "graft_ord_b",
      Tables.orders(spark, sf).select("o_orderkey", "o_orderdate"),
      buckets = 8, bucketCol = "o_orderkey")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_li_b")
        .join(spark.table("graft_ord_b"),
          col("l_orderkey") === col("o_orderkey"))
      val p = plan(joined)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("rollup aggregation is two-phase (map-side partial + final)") {
    val df = graft.engine.Aggregates.airlineMonthlyPerformance(
      StarSchema.wideView(spark, sf))
    val p = plan(df)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final HashAggregate pair in:\n$p")
  }
}
