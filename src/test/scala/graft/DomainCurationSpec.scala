package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.DomainCuration

/** Domain-level curation: blocklist anti-join semantics (incl. NULL
  * domains), reproducible per-domain caps, and the rollup's
  * distinct-dup-involvement counting. */
class DomainCurationSpec extends SparkSpec {

  private def docs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "spam.example", "alpha beta gamma delta"),
      (2L, "spam.example", "epsilon zeta eta theta"),
      (3L, "good.example", "alpha beta gamma delta"),
      (4L, "good.example", "alpha beta gamma echo"),
      (5L, "good.example", "one two three four"),
      (6L, null.asInstanceOf[String], "unattributed text here now"))
      .toDF("doc_id", "source", "text")
  }

  test("blocklist drops listed domains and PRESERVES null-domain rows") {
    val kept = DomainCuration.applyBlocklist(docs, "source",
      Seq("spam.example"))
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(3L, 4L, 5L, 6L),
      "anti-join must keep the NULL domain a NOT IN would erase")
    assertThrows[IllegalArgumentException] {
      DomainCuration.applyBlocklist(docs, "source", Seq.empty)
    }
  }

  test("per-domain cap is exact and reproducible") {
    val c1 = DomainCuration.capPerDomain(docs, "source", "text", cap = 2)
    val c2 = DomainCuration.capPerDomain(
      docs.repartition(7), "source", "text", cap = 2)
    val ids1 = c1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = c2.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2, "content-hash selection is partitioning-invariant")
    val perDomain = c1.groupBy("source").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(perDomain.values.forall(_ <= 2))
    assert(perDomain(Some("good.example")) == 2L, "3 docs capped to 2")
  }

  test("profile counts a doc's dup involvement ONCE and rates per domain") {
    import spark.implicits._
    // Doc 3 is in TWO pairs (with 1 and 4) but must count once.
    val pairs = Seq((1L, 3L, 1.0), (3L, 4L, 0.75))
      .toDF("id_a", "id_b", "jaccard")
    val prof = DomainCuration.domainProfile(
        docs.filter(col("source").isNotNull), pairs,
        "doc_id", "source", "text")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(prof("spam.example") == ((2L, 1L, 0.5)),
      "doc 1 dup-involved, doc 2 clean")
    assert(prof("good.example") == ((3L, 2L, 0.666667)),
      "docs 3 and 4 involved; doc 3 counted once despite two pairs")
  }
}
