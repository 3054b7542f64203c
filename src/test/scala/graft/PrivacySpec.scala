package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.Privacy

/** k-anonymity invariants of the publish-safe customer extract. */
class PrivacySpec extends SparkSpec {

  private lazy val customers = Tables.customer(spark, sf)

  test("every surviving quasi-identifier group has at least k members") {
    val k = 5
    val out = Privacy.anonymizeCustomers(customers, k).cache()
    val smallest = out.groupBy("acctbal_band", "c_mktsegment")
      .count().agg(min("count")).head().getLong(0)
    assert(smallest >= k, s"group of $smallest survived k=$k")
    assert(out.count() > 0, "suppression must not empty the extract")
  }

  test("suppression drops exactly the small groups, nothing else") {
    val k = 5
    val bandOf = (floor(col("c_acctbal") / 1000) * 1000).cast("long")
    val full = customers.groupBy(bandOf.as("acctbal_band"),
      col("c_mktsegment")).count()
    val expectKept = full.where(col("count") >= k)
      .agg(sum("count")).head().getLong(0)
    assert(Privacy.anonymizeCustomers(customers, k).count() == expectKept)
  }

  test("pseudonyms are deterministic and never expose the name") {
    val out = Privacy.anonymizeCustomers(customers, 1)
    val again = Privacy.anonymizeCustomers(customers, 1)
    assert(out.exceptAll(again).count() == 0)
    // 64 lowercase hex chars, no raw name substring.
    val bad = out.where(!col("pseudo_id").rlike("^[0-9a-f]{64}$")).count()
    assert(bad == 0)
    // Deterministic = longitudinally joinable: the same c_name maps to
    // the same pseudonym, so extract-to-extract joins keep working.
    assert(out.select("pseudo_id").distinct().count() ==
      customers.select("c_name").distinct().count())
  }
}
