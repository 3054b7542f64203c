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

  test("licenseGate/licenseAudit: allowlist filtering, unknown quarantine") {
    import spark.implicits._
    val d = Seq(
      (1L, "src0", "a b c"),      // cc-by (allowed)
      (2L, "src1", "d e"),        // public-domain (allowed)
      (3L, "src2", "f g h i"),    // cc-by-nc
      (4L, "src3", "j"),          // proprietary
      (5L, "src0", "k l"),        // cc-by again
      (6L, "ghost", "m n o"))     // not in the dimension
      .toDF("doc_id", "source", "text")
    val dim = DomainCuration.syntheticLicenses(
      d.filter(col("source") =!= "ghost"), "source")
    val kept = DomainCuration.licenseGate(d, dim, "source")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 5L), "nc/proprietary/unknown all dropped")
    val audit = DomainCuration.licenseAudit(d, dim, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Int]("allowed"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("total_tokens")))).toMap
    assert(audit("cc-by") == ((1, 2L, 5L)))
    assert(audit("public-domain") == ((1, 1L, 2L)))
    assert(audit("cc-by-nc") == ((0, 1L, 4L)))
    assert(audit("proprietary") == ((0, 1L, 1L)))
    assert(audit("unknown") == ((0, 1L, 3L)),
      "missing provenance surfaces as unknown, never usable")
  }

  test("canonicalizeUrl: every noise axis collapses; content params survive") {
    import spark.implicits._
    val cases = Seq(
      // scheme, www, host case, trailing slash, fragment all collapse.
      "https://www.Site.Example.com/a/b/" -> "site.example.com/a/b",
      "http://site.example.com/a/b#frag" -> "site.example.com/a/b",
      // tracking params drop wherever they sit; content params stay.
      "https://h.co/p?utm_source=x&id=2" -> "h.co/p?id=2",
      "https://h.co/p?id=2&utm_medium=y" -> "h.co/p?id=2",
      "https://h.co/p?utm_a=1&id=2&utm_b=3" -> "h.co/p?id=2",
      "https://h.co/p?fbclid=abc" -> "h.co/p",
      "https://h.co/p?id=2&gclid=g&q=x" -> "h.co/p?id=2&q=x",
      // root path and no-query stay minimal.
      "https://h.co/" -> "h.co",
      "http://h.co/p?x=1" -> "h.co/p?x=1")
    val got = cases.map(_._1).toDF("url")
      .select(DomainCuration.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2),
      got.zip(cases).filter { case (g, (_, w)) => g != w }.mkString("; "))
  }

  test("canonicalUrlReport groups raw spellings under one canonical form") {
    import spark.implicits._
    val d = Seq(
      (1L, "https://www.h.co/p?utm_source=a"),
      (2L, "http://h.co/p/"),
      (3L, "https://h.co/p#f"),
      (4L, "https://h.co/other"))
      .toDF("doc_id", "url")
    val rep = DomainCuration.canonicalUrlReport(d, "doc_id", "url")
      .orderBy("canonical_url").collect()
    assert(rep.length == 2)
    assert(rep(1).getString(0) == "h.co/p" &&
      rep(1).getAs[Long]("rep_id") == 1L &&
      rep(1).getAs[Long]("n_docs") == 3L &&
      rep(1).getAs[Long]("n_raw_forms") == 3L)
    assert(rep(0).getString(0) == "h.co/other" &&
      rep(0).getAs[Long]("n_docs") == 1L)
  }
}
