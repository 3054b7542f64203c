package graft

import org.apache.spark.sql.functions._

import graft.engine.{Aggregates, Tables}
import graft.operators.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert replaces matched keys and inserts new ones") {
    val target = Seq((1L, "old-1"), (2L, "old-2"), (3L, "old-3"))
      .toDF("k", "v")
    val source = Seq((2L, "new-2"), (9L, "new-9")).toDF("k", "v")
    val got = Merge.upsert(target, source, "k")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "old-1"), (2L, "new-2"), (3L, "old-3"),
      (9L, "new-9")))
  }

  test("additive combine == full recompute, bit-for-bit (q86 semantics)") {
    val orders = Tables.orders(spark, sf)
    def totalsDec(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice")
            .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
            .as("spend_dec"))
    val combined = Merge.combineAdditive(
      totalsDec(orders.where(month(col("o_orderdate")) <= 11)),
      totalsDec(orders.where(month(col("o_orderdate")) === 12)),
      "o_custkey", Seq("n_orders", "spend_dec"))
    val full = totalsDec(orders)
    // DECIMAL addition is exact, so the O(delta) refresh must equal the
    // O(history) recompute exactly — including keys present in only one
    // side (zero-coalesced).
    assert(combined.exceptAll(full).count() == 0)
    assert(full.exceptAll(combined).count() == 0)
  }

  test("incremental upsert equals the full recompute (q63 semantics)") {
    val orders = Tables.orders(spark, sf)
    def totals(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          Aggregates.sumExact(col("o_totalprice")).as("total_spend"))
    val target = totals(orders.where(month(col("o_orderdate")) <= 11))
    val changed = orders.where(month(col("o_orderdate")) === 12)
      .select("o_custkey").distinct()
    val source = totals(orders.join(changed, "o_custkey"))
    val merged = Merge.upsert(target, source, "o_custkey")
    // A customer untouched in month 12 keeps identical totals either
    // way, a touched one is fully recomputed — so the merged table must
    // equal computing everything from scratch.
    val full = totals(orders)
    assert(merged.exceptAll(full).count() == 0)
    assert(full.exceptAll(merged).count() == 0)
  }

  test("scd2: consecutive-same collapse, half-open ranges, one current row per key") {
    // key 1: A(d1) A(d2) B(d3) A(d5) — the repeated A at d2 collapses;
    // key 2: X only; tie-break: two same-ts events on key 3 order by tie.
    val log = Seq(
      (1L, "A", 1000L, 10L), (1L, "A", 2000L, 11L), (1L, "B", 3000L, 12L),
      (1L, "A", 5000L, 13L),
      (2L, "X", 1000L, 20L),
      (3L, "P", 1000L, 31L), (3L, "Q", 1000L, 30L)
    ).toDF("k", "v", "ts", "tie")
    val got = Merge.scd2(log, "k", "v", "ts", "tie")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(got == Set(
      (1L, "A", 1000L, Some(3000L), false),
      (1L, "B", 3000L, Some(5000L), false),
      (1L, "A", 5000L, None, true),
      (2L, "X", 1000L, None, true),
      // same-ts events: tie column orders Q(tie=30) before P(tie=31)
      (3L, "Q", 1000L, Some(1000L), false),
      (3L, "P", 1000L, None, true)))
    // exactly one current row per key
    val curr = Merge.scd2(log, "k", "v", "ts", "tie")
      .groupBy("k").agg(sum(when(col("is_current"), 1).otherwise(0)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(curr.values.forall(_ == 1L))
  }

  test("scd2: NULL attribute values are change points, not dropped rows") {
    // key 1: NULL(d1) A(d2) NULL(d3) NULL(d4) A(d6) — the NULL periods
    // must survive (null-safe change detection), the repeated NULL at d4
    // must collapse, and a leading NULL row must not be confused with
    // "no previous row".
    // key 2: starts NULL and stays NULL — exactly one (current) row.
    val log = Seq(
      (1L, None, 1000L, 10L), (1L, Some("A"), 2000L, 11L),
      (1L, None, 3000L, 12L), (1L, None, 4000L, 13L),
      (1L, Some("A"), 6000L, 14L),
      (2L, None, 1000L, 20L), (2L, None, 2000L, 21L)
    ).toDF("k", "v", "ts", "tie")
    val got = Merge.scd2(log, "k", "v", "ts", "tie")
      .as[(Long, Option[String], Long, Option[Long], Boolean)]
      .collect().toSet
    assert(got == Set(
      (1L, None, 1000L, Some(2000L), false),
      (1L, Some("A"), 2000L, Some(3000L), false),
      (1L, None, 3000L, Some(6000L), false),
      (1L, Some("A"), 6000L, None, true),
      (2L, None, 1000L, None, true)))
  }

  test("scd2 plans ONE exchange: both windows share the key partitioning") {
    val df = Merge.scd2(Tables.orders(spark, sf),
      "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
    df.collect()
    // Final AQE plan only — the "Initial Plan" section would double-count.
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"scd2 must shuffle once on the key, not per window:\n$p")
  }
}
