package graft.operators

import org.apache.spark.sql.DataFrame
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
}
