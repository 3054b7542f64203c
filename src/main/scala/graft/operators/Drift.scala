package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Aggregates

/** Distribution-drift monitoring: Population Stability Index between a
  * reference and a current snapshot of a numeric column —
  * `PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)` over fixed-width bins,
  * the standard "did my feature/corpus distribution move" check every
  * ML monitoring stack runs between training and serving data (rule of
  * thumb: <0.1 stable, 0.1–0.25 drifting, >0.25 shifted).
  *
  * Scale shape: each side collapses to per-bin counts map-side (one
  * partial/final agg per snapshot — the only corpus-sized work), the
  * joined bin table is tiny (≤ value-range/width rows), and the
  * normalizers ride a one-row broadcast. Add-one smoothing over the
  * UNION bin set keeps every log finite when a bin is empty on one
  * side (the proper comparison: both models share the same support).
  * Per-bin terms are decimal-quantized and summed exactly, so the
  * statistic is reduce-order independent and oracle-replayable. */
object Drift {

  /** NULL-SAFE full outer join of the two per-bin count tables: a null
    * key (null feature value / null category) is ONE shared bin on
    * both sides, not two unmatched bins — `Seq("bin")` join keys use
    * null-unsafe equality and would split it, inflating n_bins and
    * replacing the matched term with two spurious one-sided ones. */
  private def outerBins(r: DataFrame, c: DataFrame): DataFrame = {
    val cc = c.withColumnRenamed("bin", "bin_c")
    r.join(cc, col("bin") <=> col("bin_c"), "full_outer")
      .select(coalesce(col("bin"), col("bin_c")).as("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
  }

  /** Smoothed per-bin shares + PSI term over a joined bin-count table —
    * THE one place the smoothing formula lives, so the numeric and
    * categorical forms can never desynchronize (DriftSpec asserts
    * their equality on matching counts). */
  private def withTerms(joined: DataFrame): DataFrame = {
    val totals = joined.agg(sum(col("n_ref")).as("tot_ref"),
      sum(col("n_cur")).as("tot_cur"), count(lit(1)).as("n_bins"))
    val p = (col("n_ref") + 1).cast("double") / (col("tot_ref") + col("n_bins"))
    val q = (col("n_cur") + 1).cast("double") / (col("tot_cur") + col("n_bins"))
    joined.crossJoin(broadcast(totals))
      .withColumn("p", p).withColumn("q", q)
      .withColumn("psi_term", (col("p") - col("q")) * log(col("p") / col("q")))
  }

  /** One-row PSI summary of a termed bin table. Scale 12: PSI terms
    * sit at 1e-4..1e-6 — the default 6-decimal quantization would keep
    * ~1 significant digit per term. */
  private def summarize(terms: DataFrame): DataFrame =
    terms.agg(Aggregates.sumExact(col("psi_term"), scale = 12).as("psi"),
      count(lit(1)).as("n_bins"),
      sum(col("n_ref")).as("n_ref"),
      sum(col("n_cur")).as("n_cur"))

  /** Per-bin PSI decomposition: bin_lo, both counts, both smoothed
    * shares, and the bin's PSI term. */
  def psiBins(ref: DataFrame, cur: DataFrame, valueCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, n: String) = df
      .select(floor(col(valueCol) / binWidth).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(n))
    withTerms(outerBins(binned(ref, "n_ref"), binned(cur, "n_cur")))
      .select((col("bin") * binWidth).as("bin_lo"),
        col("n_ref"), col("n_cur"), col("p"), col("q"), col("psi_term"))
  }

  /** The scalar PSI summary: one row with the exact-decimal PSI, the
    * bin count, and both snapshot sizes. */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
      binWidth: Double): DataFrame =
    summarize(psiBins(ref, cur, valueCol, binWidth))

  /** Categorical PSI: the same statistic over a KEY column instead of
    * numeric bins — each distinct key is its own bin (union key set,
    * add-one smoothing). The corpus-monitoring form: PSI over token
    * frequencies between two snapshots is vocabulary drift ("did the
    * corpus language shift"), over `source`/`lang` columns it is mix
    * drift. Same scale shape as [[psi]]: per-side map-side counts, a
    * key-set-sized join, exact term sum. */
  def psiCategorical(ref: DataFrame, cur: DataFrame,
      keyCol: String): DataFrame = {
    def counted(df: DataFrame, n: String) =
      df.groupBy(col(keyCol).as("bin")).agg(count(lit(1)).as(n))
    summarize(withTerms(
      outerBins(counted(ref, "n_ref"), counted(cur, "n_cur"))))
  }

  /** Shared SQL tail: the smoothing/term/summary CTEs over a `j(bin,
    * n_ref, n_cur)` CTE the caller supplies. The bin join must be
    * NULL-SAFE (`IS NOT DISTINCT FROM`) to replay [[outerBins]]. */
  private def sqlTail: String =
    s"""t AS (SELECT SUM(n_ref) AS tot_ref, SUM(n_cur) AS tot_cur,
       |    COUNT(*) AS n_bins FROM j),
       |terms AS (SELECT
       |    (CAST(n_ref + 1 AS DOUBLE) / (tot_ref + n_bins) -
       |     CAST(n_cur + 1 AS DOUBLE) / (tot_cur + n_bins)) *
       |    ln((CAST(n_ref + 1 AS DOUBLE) / (tot_ref + n_bins)) /
       |       (CAST(n_cur + 1 AS DOUBLE) / (tot_cur + n_bins))) AS psi_term,
       |    n_ref, n_cur
       |  FROM j, t)
       |SELECT ${Aggregates.sumExactSql("psi_term", scale = 12)} AS psi,
       |  COUNT(*) AS n_bins,
       |  CAST(SUM(n_ref) AS BIGINT) AS n_ref,
       |  CAST(SUM(n_cur) AS BIGINT) AS n_cur
       |FROM terms""".stripMargin

  /** SQL twin of [[psiCategorical]] over token frequencies of
    * `documents` split by doc_id parity — vocabulary drift. */
  def vocabDriftSql(): String =
    s"""WITH toks AS (SELECT doc_id % 2 AS side,
       |    unnest(string_split(text, ' ')) AS bin FROM documents),
       |r AS (SELECT bin, count(*) AS n_ref FROM toks WHERE side = 0 GROUP BY 1),
       |c AS (SELECT bin, count(*) AS n_cur FROM toks WHERE side = 1 GROUP BY 1),
       |j AS (SELECT COALESCE(r.bin, c.bin) AS bin,
       |    COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
       |  FROM r FULL JOIN c ON r.bin IS NOT DISTINCT FROM c.bin),
       |$sqlTail""".stripMargin

  /** PSI of a current snapshot against PRE-AGGREGATED reference
    * counts `(bin, n_ref)` — the form a monitoring deployment runs
    * per batch against a STORED reference histogram (the reference
    * corpus is scanned once at deploy time, never per batch; see
    * [[graft.streaming.DriftMonitor]]). Identical math to
    * [[psiCategorical]] by construction (same private chain). */
  def psiFromRefCounts(refCounts: DataFrame, cur: DataFrame,
      keyCol: String): DataFrame =
    summarize(withTerms(outerBins(
      refCounts.select(col("bin"), col("n_ref")),
      cur.groupBy(col(keyCol).as("bin")).agg(count(lit(1)).as("n_cur")))))

  /** EMBEDDING-space drift between two vector snapshots: PSI over SRP
    * sign-bucket histograms — "did the embedding distribution move",
    * the monitoring question a scalar PSI ([[psi]]) and a token PSI
    * ([[psiCategorical]] via vocab) cannot answer for a vector column.
    * Each vector maps to a `2^nBits`-way bucket by the signs of
    * `nBits` fixed random hyperplane projections
    * ([[Similarity.srpSignature]] — the Charikar construction, so
    * bucket mass is a locality-sensitive summary of direction), and
    * the bucket histograms feed the same smoothed PSI as every other
    * drift tier. A rotation/shift of the embedding cloud moves mass
    * between sign buckets and registers; identical snapshots score
    * exactly 0 by the [[psiCategorical]] self-PSI property.
    *
    * Scale shape: the signature is one codegen'd projection per side
    * (no shuffle), the histogram one `2^nBits`-bounded aggregation
    * with map-side combine, the join `2^nBits` rows — constant-size
    * state regardless of corpus scale. */
  def embeddingDrift(ref: DataFrame, cur: DataFrame, nBits: Int = 8,
      seed: Long = 7L): DataFrame = {
    require(nBits >= 1 && nBits <= 16,
      s"need 1 <= nBits <= 16 (2^nBits histogram bins), got $nBits")
    def buckets(df: DataFrame) =
      df.select(Similarity.srpSignature(nBits, seed).as("bucket"))
    psiCategorical(buckets(ref), buckets(cur), "bucket")
  }

  /** SQL twin of [[embeddingDrift]] over `embeddings` split by
    * `refPred` / `curPred` (default: vec_id parity). */
  def embeddingDriftSql(nBits: Int = 8, seed: Long = 7L,
      refPred: String = "vec_id % 2 = 0",
      curPred: String = "vec_id % 2 = 1"): String = {
    val sig = Similarity.srpSignatureSql(nBits, seed)
    s"""WITH sigs AS (SELECT CASE WHEN $refPred THEN 0 ELSE 1 END AS side,
       |    $sig AS bin
       |  FROM embeddings WHERE ($refPred) OR ($curPred)),
       |r AS (SELECT bin, count(*) AS n_ref FROM sigs WHERE side = 0 GROUP BY 1),
       |c AS (SELECT bin, count(*) AS n_cur FROM sigs WHERE side = 1 GROUP BY 1),
       |j AS (SELECT COALESCE(r.bin, c.bin) AS bin,
       |    COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
       |  FROM r FULL JOIN c ON r.bin IS NOT DISTINCT FROM c.bin),
       |$sqlTail""".stripMargin
  }

  /** SQL twin of [[psi]] over `events` split by event_id parity
    * (reference = even ids, current = odd ids), `value` binned at
    * `binWidth`. */
  def psiSql(binWidth: Double): String =
    s"""WITH r AS (SELECT CAST(FLOOR(value / $binWidth) AS BIGINT) AS bin,
       |    count(*) AS n_ref FROM events WHERE event_id % 2 = 0 GROUP BY 1),
       |c AS (SELECT CAST(FLOOR(value / $binWidth) AS BIGINT) AS bin,
       |    count(*) AS n_cur FROM events WHERE event_id % 2 = 1 GROUP BY 1),
       |j AS (SELECT COALESCE(r.bin, c.bin) AS bin,
       |    COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
       |  FROM r FULL JOIN c ON r.bin IS NOT DISTINCT FROM c.bin),
       |$sqlTail""".stripMargin
}
