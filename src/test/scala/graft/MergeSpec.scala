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
}
