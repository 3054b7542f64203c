package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Aggregates

/** Data selection via importance resampling (DSIR, Xie et al. 2023):
  * score every document by how much more likely its tokens are under a
  * TARGET corpus' unigram language model than under the general SOURCE
  * model — `log w(d) = Σ_tokens ln p_t(w) − ln p_s(w)` — then keep the
  * top-weighted documents. The cheap, embarrassingly-parallel data
  * recipe for "make the pretraining mix look like the domain I care
  * about" (the published method hashes n-grams into buckets; unigrams
  * are the same estimator with bucket = word, which this corpus'
  * closed vocabulary makes exact).
  *
  * Scale shape: two corpus token scans (one groupBy for the per-class
  * counts, one join to score) — both partial-aggregated map-side. The
  * vocabulary table (one row per distinct token with both smoothed
  * log-probs) is corpus-VOCABULARY sized, orders of magnitude smaller
  * than the corpus; the scoring join keys on the token so AQE
  * broadcasts it in practice, and the per-document reduce is a plain
  * shuffle on doc_id. Nothing driver-side, no all-pairs anything. */
object Selection {

  /** Per-document DSIR log-importance-weights against the documents
    * matching `targetFilter` (add-one smoothing over the union
    * vocabulary; both models share the same V, so the weights are
    * scale-free). `log_weight` is a decimal-exact sum of per-term
    * `tf · (ln p_t − ln p_s)` contributions — reduce-order
    * independent, oracle-replayable. */
  def dsirLogWeights(docs: DataFrame, targetFilter: Column): DataFrame = {
    // The term-frequency table (the tokenization kernel shared with
    // Retrieval's lexical leg) feeds BOTH the class-count pass and the
    // scoring join; materialized so the corpus is tokenized once, not
    // once per branch (registered for post-action release per the
    // Caches contract).
    val tf = graft.engine.Caches.materialized(
      Retrieval.termFreq(docs.withColumn("is_target", targetFilter),
        "doc_id", "text", carryCols = Seq("is_target")))
    // Per-token class counts + the two normalizers, all exact longs.
    val classCounts = tf.groupBy("w").agg(
      sum(when(col("is_target"), col("tf")).otherwise(0L)).as("ct"),
      sum(when(!col("is_target"), col("tf")).otherwise(0L)).as("cs"))
    val totals = classCounts.agg(
      sum(col("ct")).as("nt"), sum(col("cs")).as("ns"),
      count(lit(1)).as("v"))
    // llr(w) = ln((ct+1)/(nt+V)) − ln((cs+1)/(ns+V)).
    val vocab = classCounts.crossJoin(broadcast(totals))
      .select(col("w"),
        (log((col("ct") + 1).cast("double") / (col("nt") + col("v"))) -
          log((col("cs") + 1).cast("double") / (col("ns") + col("v"))))
          .as("llr"))
    tf.join(vocab, "w")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        Aggregates.sumExact(col("tf") * col("llr")).as("log_weight"))
  }

  /** Deterministic DSIR selection: the `topN` highest-weighted
    * documents (weight DESC, doc_id ASC — the paper's Gumbel-noise
    * resampling is one seeded jitter column away; ranking
    * deterministically keeps the operator regression-testable).
    * `orderBy().limit()` plans as a distributed TakeOrdered — each
    * partition keeps its local top-N and only those reach the driver
    * side of the exchange; no global single-partition sort, no global
    * window. */
  def dsirSelect(docs: DataFrame, targetFilter: Column, topN: Int): DataFrame =
    dsirLogWeights(docs, targetFilter)
      .orderBy(col("log_weight").desc, col("doc_id").asc)
      .limit(topN)

  /** SQL twin of [[dsirSelect]] with `lang = 'en'` as the target
    * (`documents` hard-wired; same smoothing, same decimal-exact sum,
    * same deterministic cut). */
  def dsirSelectSql(topN: Int, targetLang: String = "en"): String =
    s"""WITH toks AS (SELECT doc_id, lang = '$targetLang' AS is_target,
       |    unnest(string_split(text, ' ')) AS w FROM documents),
       |tf AS (SELECT doc_id, w, count(*) AS tf, any_value(is_target) AS is_target
       |  FROM toks GROUP BY 1, 2),
       |cc AS (SELECT w,
       |    SUM(CASE WHEN is_target THEN tf ELSE 0 END) AS ct,
       |    SUM(CASE WHEN NOT is_target THEN tf ELSE 0 END) AS cs
       |  FROM tf GROUP BY 1),
       |tot AS (SELECT SUM(ct) AS nt, SUM(cs) AS ns, COUNT(*) AS v FROM cc),
       |vocab AS (SELECT w,
       |    ln(CAST(ct + 1 AS DOUBLE) / (nt + v)) -
       |      ln(CAST(cs + 1 AS DOUBLE) / (ns + v)) AS llr
       |  FROM cc, tot),
       |scored AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       |    ${Aggregates.sumExactSql("tf * llr")} AS log_weight
       |  FROM tf JOIN vocab USING (w) GROUP BY 1)
       |SELECT doc_id, n_tokens, log_weight FROM scored
       |ORDER BY log_weight DESC, doc_id ASC LIMIT $topN""".stripMargin

  // ------------------------------------------------------ mixture plan

  /** DATA-MIXTURE PLAN: given target language proportions and a token
    * budget, the per-language sampling plan a pretraining run executes
    * — available token mass, the budget share, the sampling rate
    * (rate > 1 ⇔ upsampling across epochs), the epoch count, how many
    * UNIQUE tokens the plan consumes, and whether the share is
    * satisfiable under the epoch cap (repeating a tiny slice dozens of
    * times degrades the model; production mixes cap epochs, cf. the
    * <~4-epoch guidance from data-constrained scaling studies).
    * Languages with a target but NO data surface as unsatisfiable rows
    * (the plan must fail loudly, not renormalize silently); languages
    * with data but no target get weight 0.
    *
    * Shape: one token-count aggregation on the language key, full-outer
    * joined to the literal target table — language-cardinality
    * everything. */
  def mixturePlan(docs: DataFrame, langCol: String, textCol: String,
      targets: Seq[(String, Double)], budget: Long,
      maxEpochs: Int): DataFrame = {
    require(targets.nonEmpty, "no mixture targets")
    val spark = docs.sparkSession
    import spark.implicits._
    val avail = docs.groupBy(col(langCol).as("lang"))
      .agg(sum(graft.functions.TextFunctions.tokenCount(col(textCol))
        .cast("long")).as("available_tokens"))
    val t = targets.toDF("lang", "weight")
    val joined = avail.join(t, Seq("lang"), "full_outer")
      .select(col("lang"),
        coalesce(col("weight"), lit(0.0)).as("weight"),
        coalesce(col("available_tokens"), lit(0L)).as("available_tokens"))
      .withColumn("target_tokens",
        floor(col("weight") * budget).cast("long"))
    val rate0 = when(col("available_tokens") === 0, lit(null))
      .otherwise(col("target_tokens").cast("double") /
        col("available_tokens"))
    joined
      .withColumn("sampling_rate", round(coalesce(rate0, lit(0.0)), 6))
      .withColumn("epochs", coalesce(ceil(rate0).cast("int"), lit(0)))
      .withColumn("unique_tokens_used",
        least(col("available_tokens"), col("target_tokens")))
      .withColumn("satisfiable",
        when(col("target_tokens") === 0, 1)
          .when(col("available_tokens") === 0, 0)
          .when(rate0 <= maxEpochs, 1).otherwise(0))
  }

  /** Oracle twin of [[mixturePlan]] over `documents` (DuckDB; the
    * target table is a VALUES literal, the full outer join coalesces
    * keys explicitly). */
  def mixturePlanSql(targets: Seq[(String, Double)], budget: Long,
      maxEpochs: Int): String = {
    import graft.functions.TextFunctions.{Sql => T}
    val values = targets.map { case (l, w) => s"('$l', $w)" }.mkString(", ")
    s"""WITH avail AS (SELECT lang,
       |    CAST(sum(${T.tokenCount("text")}) AS BIGINT)
       |      AS available_tokens
       |  FROM documents GROUP BY lang),
       |t(lang, weight) AS (VALUES $values),
       |j AS (SELECT coalesce(a.lang, t.lang) AS lang,
       |    coalesce(t.weight, 0.0) AS weight,
       |    coalesce(a.available_tokens, 0) AS available_tokens,
       |    CAST(floor(coalesce(t.weight, 0.0) * $budget) AS BIGINT)
       |      AS target_tokens
       |  FROM avail a FULL OUTER JOIN t ON a.lang = t.lang),
       |r AS (SELECT *, CASE WHEN available_tokens = 0 THEN NULL
       |    ELSE CAST(target_tokens AS DOUBLE) / available_tokens END
       |      AS rate0 FROM j)
       |SELECT lang, weight, available_tokens, target_tokens,
       |  round(coalesce(rate0, 0.0), 6) AS sampling_rate,
       |  coalesce(CAST(ceil(rate0) AS INT), 0) AS epochs,
       |  least(available_tokens, target_tokens) AS unique_tokens_used,
       |  CASE WHEN target_tokens = 0 THEN 1
       |    WHEN available_tokens = 0 THEN 0
       |    WHEN rate0 <= $maxEpochs THEN 1 ELSE 0 END AS satisfiable
       |FROM r""".stripMargin
  }
}
