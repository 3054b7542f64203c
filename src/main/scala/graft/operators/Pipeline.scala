package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Caches
import graft.functions.{TextFunctions, TextKernels}

/** The END-TO-END curation DAG as one operator: raw crawled pages in,
  * packed training sequences + a dataset card out — every stage is the
  * library's own registered operator, composed in the order a
  * production pretraining-data run executes them (FineWeb/Dolma/CCNet
  * pipeline shape):
  *
  *   1. EXTRACT    — HTML → text ([[WebText.extractText]], q197)
  *   2. NORMALIZE  — UAX #15 NFC ([[graft.functions.TextKernels]], q179)
  *   3. GATE       — sequential filter funnel ([[Curation.filterFunnel]],
  *                   q165): encoding hygiene (q193), keyword safety
  *                   (q206), char entropy (q203), min tokens, heuristic
  *                   quality
  *   4. DEDUP      — exact prefix-filtered Jaccard pairs → connected
  *                   clusters → survivors ([[Dedup.prefixJaccardPairs]] +
  *                   [[Dedup.dedupClusters]], q43/q37/q38 — the EXACT
  *                   member of the dedup family, so the composed oracle
  *                   is equality, not a probabilistic agreement)
  *   5. CLASSIFY   — NB quality classifier trained on a slice of the
  *                   survivors, applied to all of them
  *                   ([[QualityClassifier.trainScore]], q168)
  *   6. SELECT     — quality-ordered token-budget prefix sample
  *                   ([[Curation.tokenBudgetSample]], q40)
  *   7. PACK       — sequence packing into fixed token bins
  *                   ([[Curation.packSequences]], q71)
  *   8. CARD       — dataset card over the released corpus
  *                   ([[Curation.datasetCard]], q208)
  *
  * Output is ONE long `(metric, value)` report: the input volume, the
  * per-gate funnel drops (marginal, in gate order — the ablation table
  * curation papers publish), the dedup/classifier/budget stage counts,
  * the packing stats, and the final card — so a single query adjudicates
  * the whole run. The oracle replays the entire DAG as one DuckDB CTE
  * chain built from each stage's own SQL twin (the `from`-parameterized
  * builders), nothing re-derived.
  *
  * Notes on the composed semantics:
  *   - The harness plants the q193/q203/q206 artifact schedules on the
  *     raw text BEFORE HTML synthesis (entropy replace first, then
  *     encoding artifacts, then safety terms), so the funnel's drops are
  *     real and attributable; the operators never see the schedules.
  *   - Extraction squashes whitespace, so the post-extract corpus is
  *     single-line; the line-level gates (q192/q198) live in the
  *     pre-extraction deployment position and are exercised standalone.
  *   - Stage costs at scale: extract/normalize/gates are map-only; the
  *     dedup stage is the prefix-filter index join (sublinear measured,
  *     q43); classifier is two broadcast joins; select/pack are the
  *     partition-local prefix-sum shape (q40/q71). No stage introduces
  *     a shuffle the standalone operator doesn't already pay.
  */
object Pipeline {

  /** The composed harness plant: q203's degenerate-text replace, then
    * q193's encoding artifacts, then q206's safety terms — each on its
    * own standalone schedule (23 | 7/11/13 | 19/29). */
  def plantAll(id: Column, text: Column): Column =
    Curation.plantSafetyTerms(id,
      Curation.plantEncodingArtifacts(id,
        CorpusStats.plantDegenerateText(id, text)))

  /** The funnel gates, shared between [[fullCuration]], its oracle, and
    * the PipelineSpec equivalence check. `low_entropy` is a precomputed
    * column (entropy is an aggregation, not an expression — the q167
    * precomputed-gate pattern). */
  def gateColumns(t: Column, minTokens: Int,
      minQuality: Double): Seq[(String, Column)] = Seq(
    "encoding_clean" -> (Curation.encodingDirtyCount(t) === 0),
    "safety" -> (TextFunctions.markerHits(t,
      Curation.SafetyCategories.flatMap(_._2)) === 0),
    "entropy" -> (col("low_entropy") === 0),
    "min_tokens" -> (TextFunctions.tokenCount(t) >= minTokens),
    "quality" -> (TextFunctions.qualityScore(t) >= minQuality))

  /** The gated corpus: extract → normalize → join the entropy verdict —
    * the frame both the funnel REPORT and the survivor SET read, exposed
    * so PipelineSpec can run the standalone funnel on exactly it. */
  def gatedCorpus(docs: DataFrame, minEntropy: Double): DataFrame = {
    val planted = docs.select(col("doc_id"), col("lang"),
      plantAll(col("doc_id"), col("text")).as("text"))
    val pages = planted.select(col("doc_id"), col("lang"),
      WebText.syntheticHtml(col("doc_id"), col("text")).as("html"))
    val ext = pages.select(col("doc_id"), col("lang"),
      WebText.htmlToText(col("html")).as("text"))
    val nrm = ext.select(col("doc_id"), col("lang"),
      TextKernels.nfcNormalizeCol(col("text")).as("text"))
    val ent = CorpusStats.charEntropy(nrm, "doc_id", "text", minEntropy)
      .select(col("doc_id"), col("low_entropy"))
    nrm.join(ent, Seq("doc_id"))
  }

  /** Run the whole DAG; returns the `(metric, value)` report. */
  def fullCuration(docs: DataFrame,
      minTokens: Int = 10, minQuality: Double = 0.3,
      minEntropy: Double = 2.0,
      jaccardN: Int = 3, jaccardThreshold: Double = 0.5,
      budget: Long = 20000L, binTokens: Long = 512L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = col("text")
    val gates = gateColumns(t, minTokens, minQuality)

    val gated = Caches.truncated(gatedCorpus(docs, minEntropy))
    val funnel = Curation.filterFunnel(gated, gates)
    val surv = Caches.truncated(
      gated.filter(gates.map(_._2).reduce(_ && _))
        .select("doc_id", "lang", "text"))

    val victims = Caches.truncated(Dedup.dedupClusters(
        Dedup.prefixJaccardPairs(surv, "doc_id", "text",
          jaccardN, jaccardThreshold))
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id")))
    val kept = Caches.truncated(
      surv.join(victims, Seq("doc_id"), "left_anti"))

    val scored = Caches.truncated(QualityClassifier.trainScore(
      kept.filter(col("doc_id") % 3 === 0)
        .withColumn("label_good", col("lang") === "en"),
      "text", "label_good", kept, "doc_id", "text"))
    val sel = Caches.truncated(kept.join(
      scored.filter(col("is_good") === 1).select("doc_id"), Seq("doc_id")))

    val budgeted = Caches.truncated(
      Curation.tokenBudgetSample(sel, "doc_id", "text", budget))
    val fin = Caches.truncated(
      sel.join(budgeted.select("doc_id"), Seq("doc_id")))
    val bins = Caches.truncated(
      Curation.packSequences(fin, "doc_id", "text", binTokens))

    def one(name: String, df: DataFrame, v: Column): DataFrame =
      df.agg(v.cast("double").as("value"))
        .select(lit(name).as("metric"), col("value"))
    val report =
      one("000_input_docs", docs, count(lit(1)))
        .unionAll(funnel.select(
          format_string("1%02d_drop_%s", col("stage"), col("gate"))
            .as("metric"),
          col("n_dropped").cast("double").as("value")))
        .unionAll(one("190_gate_survivors", surv, count(lit(1))))
        .unionAll(one("200_dedup_victims", victims, count(lit(1))))
        .unionAll(one("210_dedup_survivors", kept, count(lit(1))))
        .unionAll(one("300_classifier_rejected",
          scored.filter(col("is_good") === 0), count(lit(1))))
        .unionAll(one("310_classifier_kept", sel, count(lit(1))))
        .unionAll(one("400_budget_docs", fin, count(lit(1))))
        .unionAll(one("410_budget_tokens", budgeted,
          coalesce(sum("n_tokens"), lit(0L))))
        .unionAll(one("500_packed_sequences", bins,
          coalesce(countDistinct(col("bin")), lit(0L))))
        .unionAll(one("510_packed_tokens", bins,
          coalesce(sum("n_tokens"), lit(0L))))
        .unionAll(Curation.datasetCard(fin, "text", "lang")
          .select(concat(lit("600_card_"), col("metric")).as("metric"),
            col("value")))
    report.select(col("metric"), round(col("value"), 6).as("value"))
  }

  // ------------------------------------------------------------ oracle

  /** One-level CASE chains of the three harness plants (the q193/q203/
    * q206 schedules), staged as CTEs so no branch text is duplicated. */
  private def plantChainSql(from: String): String =
    s"""pl_p0 AS MATERIALIZED (SELECT doc_id, lang, CASE WHEN doc_id % 23 = 0
       |    THEN repeat('aa ', 40) ELSE text END AS text FROM $from),
       |pl_p1 AS MATERIALIZED (SELECT doc_id, lang, CASE WHEN doc_id % 7 = 0
       |    THEN text || ' caf' || chr(195) || chr(169) ELSE text END
       |    AS text FROM pl_p0),
       |pl_p2 AS MATERIALIZED (SELECT doc_id, lang, CASE WHEN doc_id % 11 = 0
       |    THEN text || chr(65533) ELSE text END AS text FROM pl_p1),
       |pl_p3 AS MATERIALIZED (SELECT doc_id, lang, CASE WHEN doc_id % 13 = 0
       |    THEN text || chr(7) ELSE text END AS text FROM pl_p2),
       |pl_p4 AS MATERIALIZED (SELECT doc_id, lang, CASE WHEN doc_id % 19 = 0
       |    THEN text || ' casino jackpot casino' ELSE text END AS text
       |    FROM pl_p3),
       |pl_raw AS MATERIALIZED (SELECT doc_id, lang, CASE WHEN doc_id % 29 = 0
       |    THEN text || ' gorefest' ELSE text END AS text FROM pl_p4)"""
      .stripMargin

  /** DuckDB replay of the WHOLE DAG — every stage is the corresponding
    * operator's own `from`-parameterized SQL twin, composed as nested
    * CTEs (DuckDB resolves outer CTE names inside nested WITH bodies,
    * the q167 embedding pattern). One parser caveat: under the
    * `WITH RECURSIVE` the cluster step needs, a CTE body that combines
    * a nested WITH with a top-level UNION is parsed as a base∪step
    * recursion candidate and loses the inner names in the second
    * branch — the dataset-card embed (whose twin ends in a UNION ALL)
    * is therefore wrapped in a subquery. Every top-level stage CTE is
    * `AS MATERIALIZED`: under this composition DuckDB otherwise
    * INLINES multiply-referenced CTEs, re-evaluating the whole
    * upstream chain per reference (measured as minutes instead of
    * seconds at sf0.001). `pl_reach` alone stays plain — a recursive
    * member cannot be materialized. */
  def fullCurationSql(
      minTokens: Int = 10, minQuality: Double = 0.3,
      minEntropy: Double = 2.0,
      jaccardN: Int = 3, jaccardThreshold: Double = 0.5,
      budget: Long = 20000L, binTokens: Long = 512L): String = {
    import TextFunctions.{Sql => T}
    val allWords = Curation.SafetyCategories.flatMap(_._2)
    val gates = Seq(
      "encoding_clean" -> s"(${Curation.encodingDirtyCountSql("text")}) = 0",
      "safety" -> s"${T.markerHits("text", allWords)} = 0",
      "entropy" -> "low_entropy = 0",
      "min_tokens" -> s"${T.tokenCount("text")} >= $minTokens",
      "quality" -> s"${T.qualityScore("text")} >= $minQuality")
    val gatePred = gates.map { case (_, g) => s"($g)" }.mkString(" AND ")
    s"""WITH RECURSIVE
       |${plantChainSql("documents")},
       |pl_ext0 AS MATERIALIZED (${WebText.extractTextSql(from = "pl_raw")}),
       |pl_ext AS MATERIALIZED (SELECT e.doc_id, r.lang, e.text
       |  FROM pl_ext0 e JOIN pl_raw r USING (doc_id)),
       |pl_nrm AS MATERIALIZED (SELECT doc_id, lang, nfc_normalize(text) AS text
       |  FROM pl_ext),
       |pl_ent AS MATERIALIZED (${CorpusStats.charEntropySql(minEntropy,
            from = "pl_nrm", planted = false)}),
       |pl_gated AS MATERIALIZED (SELECT n.doc_id, n.lang, n.text, e.low_entropy
       |  FROM pl_nrm n JOIN pl_ent e USING (doc_id)),
       |pl_funnel AS MATERIALIZED (${Curation.filterFunnelSql(gates, from = "pl_gated")}),
       |pl_surv AS MATERIALIZED (SELECT doc_id, lang, text FROM pl_gated
       |  WHERE $gatePred),
       |pl_pairs AS MATERIALIZED (
       |${Dedup.trueJaccardPairsSql(jaccardN, jaccardThreshold, "pl_surv")}
       |), pl_edges AS MATERIALIZED (
       |  SELECT id_a AS src, id_b AS dst FROM pl_pairs
       |  UNION ALL SELECT id_b, id_a FROM pl_pairs
       |), pl_reach AS (
       |  SELECT DISTINCT src AS id, src AS r FROM pl_edges
       |  UNION
       |  SELECT e.src AS id, pl_reach.r FROM pl_reach
       |  JOIN pl_edges e ON e.dst = pl_reach.id
       |), pl_clusters AS MATERIALIZED (
       |  SELECT id, MIN(r) AS cluster_id FROM pl_reach GROUP BY id
       |), pl_victims AS MATERIALIZED (
       |  SELECT id AS doc_id FROM pl_clusters WHERE id <> cluster_id
       |), pl_kept AS MATERIALIZED (SELECT * FROM pl_surv
       |  WHERE doc_id NOT IN (SELECT doc_id FROM pl_victims)),
       |pl_scored AS MATERIALIZED (${QualityClassifier.scoreSql(
            trainPred = "doc_id % 3 = 0", labelExpr = "lang = 'en'",
            applyPred = "TRUE", from = "pl_kept")}),
       |pl_sel AS MATERIALIZED (SELECT k.* FROM pl_kept k
       |  JOIN pl_scored s USING (doc_id) WHERE s.is_good = 1),
       |pl_budget AS MATERIALIZED (${Curation.tokenBudgetSampleSql(budget,
            from = "pl_sel")}),
       |pl_final AS MATERIALIZED (SELECT s.* FROM pl_sel s
       |  JOIN pl_budget b USING (doc_id)),
       |pl_bins AS MATERIALIZED (${Curation.packSequencesSql(binTokens,
            from = "pl_final")}),
       |pl_card AS MATERIALIZED (SELECT * FROM (
       |  ${Curation.datasetCardSql(from = "pl_final")}) _)
       |SELECT metric, round(value, 6) AS value FROM (
       |  SELECT '000_input_docs' AS metric,
       |    CAST(count(*) AS DOUBLE) AS value FROM documents
       |  UNION ALL SELECT printf('1%02d_drop_%s', stage, gate),
       |    CAST(n_dropped AS DOUBLE) FROM pl_funnel
       |  UNION ALL SELECT '190_gate_survivors',
       |    CAST(count(*) AS DOUBLE) FROM pl_surv
       |  UNION ALL SELECT '200_dedup_victims',
       |    CAST(count(*) AS DOUBLE) FROM pl_victims
       |  UNION ALL SELECT '210_dedup_survivors',
       |    CAST(count(*) AS DOUBLE) FROM pl_kept
       |  UNION ALL SELECT '300_classifier_rejected',
       |    CAST(count(*) AS DOUBLE) FROM pl_scored WHERE is_good = 0
       |  UNION ALL SELECT '310_classifier_kept',
       |    CAST(count(*) AS DOUBLE) FROM pl_sel
       |  UNION ALL SELECT '400_budget_docs',
       |    CAST(count(*) AS DOUBLE) FROM pl_final
       |  UNION ALL SELECT '410_budget_tokens',
       |    CAST(COALESCE(SUM(n_tokens), 0) AS DOUBLE) FROM pl_budget
       |  UNION ALL SELECT '500_packed_sequences',
       |    CAST(COUNT(DISTINCT bin) AS DOUBLE) FROM pl_bins
       |  UNION ALL SELECT '510_packed_tokens',
       |    CAST(COALESCE(SUM(n_tokens), 0) AS DOUBLE) FROM pl_bins
       |  UNION ALL SELECT '600_card_' || metric, value FROM pl_card
       |) _""".stripMargin
  }
}
