package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Aggregates
import graft.functions.TextFunctions

/** Domain-level curation — the FIRST gate of every web-crawl pipeline
  * (C4, CCNet, RefinedWeb all open with it): per-host rollups decide
  * which feeds to trust, a blocklist drops known-bad hosts wholesale,
  * and a per-domain cap stops any single host from dominating the
  * corpus (RefinedWeb's "no more than N pages per domain"). The
  * reference has no provenance tier at all; `documents.source` is the
  * host column here.
  *
  * Scale shape: the blocklist is a broadcast LEFT ANTI (the list is
  * human-curated — thousands of rows at most); the cap is
  * [[Sampling.quotaSample]]'s per-stratum rank window (partitioned by
  * domain — per-domain sorts, never a global one; selection order is
  * the content MD5, so the cap is reproducible and unbiased rather
  * than arrival-order-dependent); the rollup is one `groupBy(domain)`
  * with map-side combine, domain-cardinality output. Dup involvement
  * joins the pair frame's distinct ids back to the corpus — pair-sized,
  * never quadratic (the pairs come from the banded LSH tier).
  */
object DomainCuration {

  /** Drop every document whose `domainCol` is on the blocklist —
    * broadcast LEFT ANTI, the null-safe form of `NOT IN` (a NULL
    * domain survives an anti-join; `NOT IN` would erase the row). */
  def applyBlocklist(docs: DataFrame, domainCol: String,
      blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist: nothing to apply")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.join(broadcast(blocked.toDF(domainCol)), Seq(domainCol), "left_anti")
  }

  /** Keep at most `cap` documents per domain, selected in content-hash
    * order — [[Sampling.quotaSample]] with the domain as the stratum. */
  def capPerDomain(docs: DataFrame, domainCol: String, textCol: String,
      cap: Int): DataFrame =
    Sampling.quotaSample(docs, domainCol, textCol, cap)

  /** Per-domain rollup: document count, near-dup involvement (docs
    * appearing in ANY `dupPairs` row, distinct — a doc in five pairs
    * counts once), dup rate, and mean heuristic quality — the table a
    * pipeline reads to decide per-source weights. `dupPairs` must
    * carry `id_a`/`id_b` (the dedup tier's pair schema). */
  def domainProfile(docs: DataFrame, dupPairs: DataFrame, idCol: String,
      domainCol: String, textCol: String): DataFrame = {
    val dupIds = dupPairs.select(col("id_a").as(idCol))
      .union(dupPairs.select(col("id_b").as(idCol)))
      .distinct()
      .withColumn("is_dup", lit(1))
    docs.join(dupIds, Seq(idCol), "left")
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_dup"), lit(0))).as("n_dup_docs"),
        round(Aggregates.avgExact(
          TextFunctions.qualityScore(col(textCol))), 6).as("mean_quality"))
      .withColumn("dup_rate",
        round(col("n_dup_docs").cast("double") / col("n_docs"), 6))
      .select(col(domainCol), col("n_docs"), col("n_dup_docs"),
        col("dup_rate"), col("mean_quality"))
  }

  /** Oracle twin of blocklist → cap → profile over `documents`
    * (`source` = domain): the same NOT-IN gate (`source` is non-null
    * in this corpus, so anti-join == NOT IN), the same MD5 rank cap,
    * and the exhaustive-Jaccard pair oracle for dup involvement. */
  def curationSql(blocked: Seq[String], cap: Int, n: Int,
      threshold: Double): String = {
    import TextFunctions.{Sql => T}
    val inList = blocked.map(b => s"'$b'").mkString(", ")
    s"""WITH kept AS (
       |  SELECT doc_id, source, text FROM (
       |    SELECT d.*, ${Sampling.quotaRankSql("source", "text")} AS rn
       |    FROM documents d WHERE source NOT IN ($inList)) _
       |  WHERE rn <= $cap),
       |pairs AS (
       |${Dedup.trueJaccardPairsSql(n, threshold, from = "kept")}
       |),
       |dup_ids AS (SELECT DISTINCT id FROM (
       |  SELECT id_a AS id FROM pairs
       |  UNION ALL SELECT id_b AS id FROM pairs)),
       |agged AS (SELECT source,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(CASE WHEN di.id IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_dup_docs,
       |    round(${Aggregates.avgExactSql(T.qualityScore("text"))}, 6)
       |      AS mean_quality
       |  FROM kept LEFT JOIN dup_ids di ON di.id = kept.doc_id
       |  GROUP BY source)
       |SELECT source, n_docs, n_dup_docs,
       |  round(CAST(n_dup_docs AS DOUBLE) / n_docs, 6) AS dup_rate,
       |  mean_quality
       |FROM agged ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------- license gating

  val LicenseNames: Seq[String] =
    Seq("cc-by", "public-domain", "cc-by-nc", "proprietary")

  val AllowedLicenses: Seq[String] = Seq("cc-by", "public-domain")

  /** Deterministic per-source license dimension for the q200 harness:
    * license assigned by the source's numeric suffix mod 4. A real
    * pipeline ingests this table from its provenance system; the
    * operator below only assumes (domain → license) rows. */
  def syntheticLicenses(docs: DataFrame, domainCol: String): DataFrame = {
    val digits = regexp_extract(col(domainCol), "([0-9]+)", 1)
    val n = when(digits === "", lit(0)).otherwise(digits.cast("int"))
    docs.select(col(domainCol)).distinct()
      .withColumn("license",
        element_at(array(LicenseNames.map(lit): _*), pmod(n, lit(4)) + 1))
  }

  /** Keep only documents whose domain's license is on the allowlist —
    * broadcast inner join + IN filter (the dimension is provenance-
    * system-sized, thousands of rows at most). A domain MISSING from
    * the dimension is dropped: unknown provenance is not a usable
    * license. */
  def licenseGate(docs: DataFrame, licenses: DataFrame, domainCol: String,
      allowed: Seq[String] = AllowedLicenses): DataFrame =
    docs.join(broadcast(licenses), Seq(domainCol))
      .filter(col("license").isin(allowed: _*))
      .drop("license")

  /** License audit — the compliance rollup read alongside the gate:
    * per license, whether it is usable, how many sources and documents
    * carry it, and the token mass at stake. Domains missing from the
    * dimension surface as `unknown` (not usable) rather than vanishing.
    * One broadcast join + one license-cardinality aggregation. */
  def licenseAudit(docs: DataFrame, licenses: DataFrame, domainCol: String,
      textCol: String, allowed: Seq[String] = AllowedLicenses): DataFrame =
    docs.join(broadcast(licenses), Seq(domainCol), "left")
      .withColumn("license", coalesce(col("license"), lit("unknown")))
      .groupBy("license")
      .agg(countDistinct(col(domainCol)).as("n_sources"),
        count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col(textCol)).cast("long"))
          .as("total_tokens"))
      .withColumn("allowed",
        col("license").isin(allowed: _*).cast("int"))
      .select("license", "allowed", "n_sources", "n_docs", "total_tokens")

  /** Oracle twin of [[syntheticLicenses]] → [[licenseAudit]] over
    * `documents` (`source` = domain; the synthetic dimension covers
    * every source, so the left join degenerates to inner). */
  def licenseAuditSql(): String = {
    import TextFunctions.{Sql => T}
    val names = LicenseNames.zipWithIndex
      .map { case (nm, i) => s"WHEN $i THEN '$nm'" }.mkString(" ")
    val inList = AllowedLicenses.map(l => s"'$l'").mkString(", ")
    s"""WITH dim AS (SELECT source,
       |    CASE (CASE WHEN regexp_extract(source, '([0-9]+)', 1) = ''
       |      THEN 0 ELSE CAST(regexp_extract(source, '([0-9]+)', 1)
       |        AS INT) END) % 4 $names END AS license
       |  FROM (SELECT DISTINCT source FROM documents) _),
       |j AS (SELECT d.source, dim.license, ${T.tokenCount("d.text")}
       |    AS n_tokens FROM documents d JOIN dim USING (source))
       |SELECT license,
       |  CASE WHEN license IN ($inList) THEN 1 ELSE 0 END AS allowed,
       |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
       |FROM j GROUP BY license""".stripMargin
  }

  // ------------------------------------------------ URL canonicalization

  /** URL canonicalization — the step BEFORE any URL-keyed dedup: the
    * same page arrives from a crawl under `http`/`https`, with and
    * without `www.`, host case noise, trailing slashes, tracking
    * parameters (`utm_*`, `fbclid`, `gclid`), and fragments. The
    * canonical form is `host/path?query` with the scheme dropped, the
    * host lowercased and `www.`-stripped, the trailing slash removed,
    * tracking parameters deleted (content-identifying parameters kept),
    * and the fragment cut. Pure regex projection — codegen'd, map-only;
    * the regex dialect subset used is identical in Java regex and RE2
    * so the oracle replays it verbatim. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val host = lower(regexp_extract(noFrag, "^[a-z]+://([^/?#]+)", 1))
    val hostClean = regexp_replace(host, "^www\\.", "")
    val path = regexp_extract(noFrag, "^[a-z]+://[^/?#]+([^?#]*)", 1)
    val pathClean = regexp_replace(path, "/$", "")
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val queryClean = regexp_replace(
      regexp_replace(query, "(^|&)(utm_[a-z_]*|fbclid|gclid)=[^&]*", ""),
      "^&", "")
    concat(hostClean, pathClean,
      when(queryClean === "", lit(""))
        .otherwise(concat(lit("?"), queryClean)))
  }

  /** Canonical-URL dedup report: group documents by
    * [[canonicalizeUrl]], keeping the min-id representative, the group
    * size, and how many distinct RAW spellings the canonical form
    * collapsed (`n_raw_forms > 1` ⇔ canonicalization did work raw
    * URL-keyed dedup would have missed). One hash aggregation on the
    * canonical key — q22's exact-dedup plan with the regex
    * canonicalizer fused into the scan. */
  def canonicalUrlReport(docs: DataFrame, idCol: String,
      urlCol: String): DataFrame =
    docs.select(col(idCol), col(urlCol),
        canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(min(col(idCol)).as("rep_id"),
        count(lit(1)).as("n_docs"),
        countDistinct(col(urlCol)).as("n_raw_forms"))

  /** Deterministic URL synthesis for the q195 harness: scheme, `www.`,
    * host case, trailing slash, tracking/content parameters, and
    * fragment all vary on coprime id schedules, so canonical groups mix
    * raw spellings. Harness only. */
  def syntheticUrl(id: Column, source: Column): Column =
    concat(
      when(id % 2 === 0, lit("https")).otherwise(lit("http")),
      lit("://"),
      when(id % 3 === 0, lit("www.")).otherwise(lit("")),
      when(id % 9 === 0, upper(source)).otherwise(source),
      lit(".example.com/page/"), (id % 50).cast("string"),
      when(id % 8 === 0, lit("/")).otherwise(lit("")),
      when(id % 4 === 0,
        concat(lit("?utm_source=feed&id="), (id % 5).cast("string")))
        .when(id % 4 === 1, concat(lit("?id="), (id % 5).cast("string")))
        .otherwise(lit("")),
      when(id % 6 === 0, lit("#frag")).otherwise(lit("")))

  /** Oracle twin of [[syntheticUrl]] → [[canonicalizeUrl]] →
    * [[canonicalUrlReport]] (DuckDB; the param-strip regexp_replace
    * needs the explicit 'g' flag that is Spark's default). */
  def canonicalUrlReportSql(): String =
    s"""WITH u AS (SELECT doc_id,
       |    (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
       |    || '://'
       |    || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
       |    || (CASE WHEN doc_id % 9 = 0 THEN upper(source) ELSE source END)
       |    || '.example.com/page/' || CAST(doc_id % 50 AS VARCHAR)
       |    || (CASE WHEN doc_id % 8 = 0 THEN '/' ELSE '' END)
       |    || (CASE WHEN doc_id % 4 = 0
       |          THEN '?utm_source=feed&id=' || CAST(doc_id % 5 AS VARCHAR)
       |        WHEN doc_id % 4 = 1
       |          THEN '?id=' || CAST(doc_id % 5 AS VARCHAR)
       |        ELSE '' END)
       |    || (CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END) AS url
       |  FROM documents),
       |parts AS (SELECT doc_id, url,
       |    regexp_replace(url, '#.*$$', '') AS nofrag FROM u),
       |canon AS (SELECT doc_id, url,
       |    regexp_replace(lower(regexp_extract(nofrag,
       |      '^[a-z]+://([^/?#]+)', 1)), '^www\\.', '')
       |    || regexp_replace(regexp_extract(nofrag,
       |      '^[a-z]+://[^/?#]+([^?#]*)', 1), '/$$', '')
       |    || (CASE WHEN regexp_replace(regexp_replace(
       |          regexp_extract(nofrag, '\\?([^#]*)', 1),
       |          '(^|&)(utm_[a-z_]*|fbclid|gclid)=[^&]*', '', 'g'),
       |          '^&', '') = '' THEN ''
       |        ELSE '?' || regexp_replace(regexp_replace(
       |          regexp_extract(nofrag, '\\?([^#]*)', 1),
       |          '(^|&)(utm_[a-z_]*|fbclid|gclid)=[^&]*', '', 'g'),
       |          '^&', '') END) AS canonical_url
       |  FROM parts)
       |SELECT canonical_url, min(doc_id) AS rep_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT url) AS BIGINT) AS n_raw_forms
       |FROM canon GROUP BY canonical_url""".stripMargin
}
