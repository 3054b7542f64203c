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

  test("PII scrub replaces emails and phones, counts them, leaves clean text alone") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to alice.smith+x@corp.example.org today"),
      (2L, "call 555-123-4567 or 555-987-6543"),
      (3L, "ceci n'est pas une pii 12345 @ home 555-12-3456"),
      (4L, "mixed bob@ex.io and 555-000-1111 in one doc"))
      .toDF("doc_id", "text")
    val out = Privacy.scrubPii(df, "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "write to [EMAIL] today")
    assert(out(1L).getLong(2) == 1 && out(1L).getLong(3) == 0)
    assert(out(2L).getString(1) == "call [PHONE] or [PHONE]")
    assert(out(2L).getLong(3) == 2)
    // Near-misses (malformed phone, lone @) must pass through untouched.
    assert(out(3L).getString(1) == "ceci n'est pas une pii 12345 @ home 555-12-3456")
    assert(out(3L).getLong(2) == 0 && out(3L).getLong(3) == 0)
    assert(out(4L).getString(1) == "mixed [EMAIL] and [PHONE] in one doc")
    assert(out(4L).getLong(2) == 1 && out(4L).getLong(3) == 1)
  }

  test("card scrub redacts Luhn-valid runs only; candidates audited separately") {
    import spark.implicits._
    // 4111111111111111 is the classic Luhn-valid test PAN; flipping its
    // last digit breaks the checksum. 15- and 17-digit runs are not
    // candidates at all.
    val docs = Seq(
      (1L, "pay 4111111111111111 now"),
      (2L, "order 4111111111111112 is not a card"),
      (3L, "id 411111111111111 and 41111111111111111 are wrong length"),
      (4L, "two cards 4111111111111111 and 4111111111111111 one order 1234567890123450"),
      (5L, "no digits at all"))
      .toDF("doc_id", "text")
    val out = graft.operators.Privacy.scrubCards(docs, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("pay [CARD] now", 1L, 1L)))
    assert(out(2L) == (("order 4111111111111112 is not a card", 1L, 0L)))
    assert(out(3L)._2 == 0L && out(3L)._3 == 0L &&
      out(3L)._1 == "id 411111111111111 and 41111111111111111 are wrong length")
    // 1234567890123450: Luhn-valid? Its check makes this a planted
    // assertion either way — compute the truth from the kernel-
    // independent reference used in TextKernelProperties.
    val orderValid = {
      val s = "1234567890123450".reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
      }.sum
      s % 10 == 0
    }
    assert(out(4L)._2 == 3L)
    assert(out(4L)._3 == (if (orderValid) 3L else 2L))
    assert(out(4L)._1.contains("[CARD] and [CARD]"))
    assert(out(5L) == (("no digits at all", 0L, 0L)))
  }
}
