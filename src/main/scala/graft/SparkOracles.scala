package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.DataFrame

import graft.engine.{Aggregates, Cleaning, Sinks, StarSchema, Tables}
import graft.functions.{TextFunctions, WeightedMean}
import graft.operators.{CorpusStats, Curation, Dedup, EventAnalytics, Merge, Multimodal, Privacy, QualityClassifier, QualityReport, Retrieval, Sampling, Similarity}
import graft.streaming.EventStream

import SparkEntry.{custTotalsSql, filterMonths, filterAirlines, MixtureTargets}

/** The DuckDB oracle registry — one ANSI-SQL twin per [[SparkEntry]]
  * query (same keys; BenchSpec pins the correspondence). Split from
  * SparkEntry purely for file size: these are replay STRINGS, consumed
  * only by Verify's dump and the driver's DuckDB gate, so the split
  * cannot change any query's plan or timing. Shared CTE preludes the
  * oracles interpolate (the wide view, the IVF chain, the airline/
  * airport rollups) live here with them. */
private[graft] object SparkOracles {

  private def withWide(body: String): String =
    s"WITH wide AS (\n${StarSchema.wideViewSql}\n)\n$body"

  /** The q28 IVF chain's shared prelude — trained centroids, corpus/
    * query projections, nearest-cell assignments — interpolated into
    * BOTH the q28 oracle and the ANN-evaluation oracles, so a retune
    * (nProbe, tie-breaks, stride) can never silently diverge the
    * ranking q28 gates from the ranking q155/q163 evaluate. */
  private lazy val ivfChainCtes = s"""WITH ${
      graft.operators.Clustering.kmeansCentsSql(initStride = 53, iters = 2)},
    |corpus AS (SELECT vec_id AS neighbor_id, embedding AS c_emb FROM embeddings),
    |qs AS (SELECT vec_id AS query_id, embedding AS q_emb
    |       FROM embeddings WHERE vec_id < 10),
    |corpus_cells AS (
    |  SELECT neighbor_id, c_emb, cent_id FROM (
    |    SELECT neighbor_id, c_emb, cent_id,
    |      ROW_NUMBER() OVER (PARTITION BY neighbor_id
    |        ORDER BY ${Similarity.Sql.cosine("c_emb", "cent_emb")} DESC, cent_id) AS r
    |    FROM corpus CROSS JOIN cents) t WHERE r = 1),
    |query_cells AS (
    |  SELECT query_id, q_emb, cent_id FROM (
    |    SELECT query_id, q_emb, cent_id,
    |      ROW_NUMBER() OVER (PARTITION BY query_id
    |        ORDER BY ${Similarity.Sql.cosine("q_emb", "cent_emb")} DESC, cent_id) AS r
    |    FROM qs CROSS JOIN cents) t WHERE r <= 3)""".stripMargin

  /** Shared CTE chain of the ANN-evaluation oracles (q155 recall, q163
    * MRR): the q26 brute ranking as `bt` and the q28 IVF ranking as
    * `iv` (rank retained) side by side, over [[ivfChainCtes]]. */
  private lazy val annEvalCtes = s"""$ivfChainCtes,
    |bt AS (
    |  SELECT query_id, neighbor_id, rank AS t_rank, cos AS t_cos FROM (
    |    SELECT query_id, neighbor_id,
    |      ${Similarity.Sql.cosine("q_emb", "c_emb")} AS cos,
    |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
    |        ${Similarity.Sql.cosine("q_emb", "c_emb")} DESC, neighbor_id) AS rank
    |    FROM corpus JOIN qs ON query_id != neighbor_id) t
    |  WHERE rank <= 5),
    |iv AS (
    |  SELECT query_id, neighbor_id, rank, cos AS a_cos FROM (
    |    SELECT query_id, neighbor_id,
    |      ${Similarity.Sql.cosine("q_emb", "c_emb")} AS cos,
    |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
    |        ${Similarity.Sql.cosine("q_emb", "c_emb")} DESC, neighbor_id) AS rank
    |    FROM corpus_cells JOIN query_cells USING (cent_id)
    |    WHERE query_id != neighbor_id) t
    |  WHERE rank <= 5)""".stripMargin

  private val airlineMonthlyCte =
    s"""WITH wide AS (
       |${StarSchema.wideViewSql}
       |), am AS (
       |${Aggregates.airlineMonthlyPerformanceSql}
       |)""".stripMargin

  private val airportPerfCte =
    s"""WITH wide AS (
       |${StarSchema.wideViewSql}
       |), ap AS (
       |${Aggregates.airportPerformanceSql}
       |)""".stripMargin

  def sql: Map[String, String] = ListMap(
    "q01_wide_view" -> withWide(
      "SELECT * FROM wide ORDER BY l_orderkey, l_linenumber"),

    "q02_airline_monthly" -> s"""$airlineMonthlyCte
      |SELECT airline_name, month, depdel15_count,
      |  CAST(depdel15_sum AS BIGINT) AS depdel15_sum,
      |  delay_minutes_mean,
      |  CAST(is_cancelled_sum AS BIGINT) AS is_cancelled_sum,
      |  carrier_delay_sum, weather_delay_sum, nas_delay_sum,
      |  late_aircraft_delay_sum, on_time_rate
      |FROM am ORDER BY airline_name, month""".stripMargin,

    "q03_airport_performance" -> s"""$airportPerfCte
      |SELECT airline_name, month, origin_city, total_flights,
      |  CAST(delayed_flights AS BIGINT) AS delayed_flights
      |FROM ap ORDER BY airline_name, month, origin_city""".stripMargin,

    "q04_kpis" -> s"""$airlineMonthlyCte
      |SELECT CAST(SUM(depdel15_count) AS BIGINT) AS total_flights,
      |  CAST(SUM(depdel15_sum) AS BIGINT) AS delayed_flights,
      |  CAST(SUM(is_cancelled_sum) AS BIGINT) AS cancelled_flights,
      |  ${Aggregates.sumExactSql("on_time_rate * depdel15_count", 10)} /
      |  ${Aggregates.sumExactSql("depdel15_count", 10)} * 100 AS avg_otp_pct
      |FROM am""".stripMargin,

    "q05_ranking" -> s"""$airlineMonthlyCte
      |SELECT airline_name,
      |  ${Aggregates.sumExactSql("delay_minutes_mean", 10)} / COUNT(*) AS avg_delay
      |FROM am GROUP BY airline_name
      |ORDER BY avg_delay NULLS FIRST, airline_name""".stripMargin,

    "q06_trend" -> s"""$airlineMonthlyCte
      |SELECT month,
      |  ${Aggregates.sumExactSql("on_time_rate", 10)} / COUNT(*) AS avg_on_time_rate,
      |  CASE month WHEN 1 THEN 'Jan' WHEN 2 THEN 'Feb' WHEN 3 THEN 'Mar'
      |    WHEN 4 THEN 'Apr' WHEN 5 THEN 'May' WHEN 6 THEN 'Jun'
      |    WHEN 7 THEN 'Jul' WHEN 8 THEN 'Aug' WHEN 9 THEN 'Sep'
      |    WHEN 10 THEN 'Oct' WHEN 11 THEN 'Nov' WHEN 12 THEN 'Dec'
      |  END AS month_label
      |FROM am GROUP BY month ORDER BY month""".stripMargin,

    "q07_delay_attribution" -> s"""$airlineMonthlyCte, tot AS (
      |  SELECT ${Aggregates.sumExactSql("carrier_delay_sum")} AS carrier,
      |    ${Aggregates.sumExactSql("weather_delay_sum")} AS weather,
      |    ${Aggregates.sumExactSql("nas_delay_sum")} AS nas,
      |    ${Aggregates.sumExactSql("late_aircraft_delay_sum")} AS late_aircraft
      |  FROM am)
      |SELECT cause, minutes FROM (
      |  SELECT 'carrier' AS cause, carrier AS minutes FROM tot
      |  UNION ALL SELECT 'weather', weather FROM tot
      |  UNION ALL SELECT 'nas', nas FROM tot
      |  UNION ALL SELECT 'late_aircraft', late_aircraft FROM tot)
      |ORDER BY cause""".stripMargin,

    "q08_geo_map" -> s"""$airportPerfCte
      |SELECT ap.origin_city, coords.lat, coords.lon,
      |  CAST(SUM(total_flights) AS BIGINT) AS total_flights,
      |  CAST(SUM(delayed_flights) AS BIGINT) AS delayed_flights,
      |  ROUND(CASE WHEN SUM(total_flights) > 0
      |    THEN CAST(CAST(SUM(delayed_flights) AS BIGINT) AS DOUBLE)
      |         / CAST(SUM(total_flights) AS BIGINT) * 100
      |    ELSE 0.0 END, 2) AS delay_rate
      |FROM ap JOIN ${Aggregates.coordsSql} ON ap.origin_city = coords.origin_city
      |GROUP BY ap.origin_city, coords.lat, coords.lon
      |ORDER BY ap.origin_city""".stripMargin,

    "q09_dim_airports" -> """SELECT airport_key, n_name AS city,
      |  n_regionkey AS state_key
      |FROM (SELECT c_nationkey AS airport_key FROM customer
      |      UNION SELECT s_nationkey FROM supplier) u
      |JOIN nation ON u.airport_key = nation.n_nationkey
      |ORDER BY airport_key""".stripMargin,

    "q10_dim_calendar" -> """SELECT date_key,
      |  CAST(year(date_key) AS INTEGER) AS year,
      |  CAST(month(date_key) AS INTEGER) AS month,
      |  CAST(day(date_key) AS INTEGER) AS day_of_month,
      |  CAST(isodow(date_key) AS INTEGER) AS day_of_week,
      |  CASE WHEN isodow(date_key) >= 6 THEN 1 ELSE 0 END AS is_weekend
      |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS date_key FROM orders)
      |ORDER BY date_key""".stripMargin,

    "q11_distinct_months" -> withWide(
      "SELECT DISTINCT month FROM wide ORDER BY month NULLS FIRST"),

    "q12_distinct_airlines" -> withWide(
      "SELECT DISTINCT airline_name FROM wide ORDER BY airline_name NULLS FIRST"),

    "q13_filtered_kpis" -> s"""$airlineMonthlyCte
      |SELECT CAST(SUM(depdel15_count) AS BIGINT) AS total_flights,
      |  CAST(SUM(depdel15_sum) AS BIGINT) AS delayed_flights,
      |  CAST(SUM(is_cancelled_sum) AS BIGINT) AS cancelled_flights,
      |  ${Aggregates.sumExactSql("on_time_rate * depdel15_count", 10)} /
      |  ${Aggregates.sumExactSql("depdel15_count", 10)} * 100 AS avg_otp_pct
      |FROM am
      |WHERE month IN (${filterMonths.mkString(", ")})
      |  AND airline_name IN (${filterAirlines.map(a => s"'$a'").mkString(", ")})""".stripMargin,

    "q14_filtered_geo" -> s"""$airportPerfCte
      |SELECT ap.origin_city, coords.lat, coords.lon,
      |  CAST(SUM(total_flights) AS BIGINT) AS total_flights,
      |  CAST(SUM(delayed_flights) AS BIGINT) AS delayed_flights,
      |  ROUND(CASE WHEN SUM(total_flights) > 0
      |    THEN CAST(CAST(SUM(delayed_flights) AS BIGINT) AS DOUBLE)
      |         / CAST(SUM(total_flights) AS BIGINT) * 100
      |    ELSE 0.0 END, 2) AS delay_rate
      |FROM ap JOIN ${Aggregates.coordsSql} ON ap.origin_city = coords.origin_city
      |WHERE month IN (4, 5, 6, 7, 8, 9)
      |GROUP BY ap.origin_city, coords.lat, coords.lon
      |ORDER BY ap.origin_city""".stripMargin,

    "q15_union_counts" -> withWide(
      """SELECT * FROM (
        |  SELECT 'lineitem' AS src, COUNT(*) AS n FROM lineitem
        |  UNION ALL SELECT 'wide', COUNT(*) FROM wide)
        |ORDER BY src""".stripMargin),

    "q16_time_format" -> """SELECT l_orderkey, l_linenumber,
      |  CAST((l_orderkey * 7 + l_linenumber) % 2401 AS INTEGER) AS hhmm,
      |  substr(t, 1, 2) || ':' || substr(t, 3, 2) AS dep_time
      |FROM (SELECT l_orderkey, l_linenumber,
      |  regexp_replace(lpad(CAST(CAST(COALESCE(
      |    (l_orderkey * 7 + l_linenumber) % 2401, 0) AS INTEGER) AS VARCHAR),
      |    4, '0'), '^2400$', '0000') AS t
      |  FROM lineitem)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q17_cleaning_flags" -> """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS date_str,
      |  CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS date_key,
      |  CASE WHEN isodow(o_orderdate) >= 6 THEN 1 ELSE 0 END AS is_weekend,
      |  CAST(COALESCE(CASE WHEN o_orderstatus = 'F' THEN 1 END, 0) AS INTEGER)
      |    AS is_cancelled,
      |  COALESCE(CASE WHEN o_orderstatus = 'O' THEN NULL
      |    ELSE o_totalprice END, 0.0) AS price_filled
      |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q18_top3_per_month" -> s"""$airportPerfCte
      |SELECT * FROM (
      |  SELECT airline_name, month, origin_city, total_flights,
      |    CAST(delayed_flights AS BIGINT) AS delayed_flights,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY month
      |      ORDER BY total_flights DESC, airline_name, origin_city)
      |      AS INTEGER) AS rn
      |  FROM ap) t
      |WHERE rn <= 3 ORDER BY month, rn""".stripMargin,

    "q19_weighted_mean" -> withWide(
      s"""SELECT airline_name,
         |  ROUND(${WeightedMean.sql("l_extendedprice", "l_quantity")}, 6)
         |    AS w_avg_price
         |FROM wide GROUP BY airline_name ORDER BY airline_name""".stripMargin),

    "q20_limit10" -> withWide(
      """SELECT l_orderkey, l_linenumber, airline_name, month, dep_del15
        |FROM wide ORDER BY l_orderkey, l_linenumber LIMIT 10""".stripMargin),

    "q21_sql_view" -> withWide(
      """SELECT month, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
        |FROM wide GROUP BY month ORDER BY month""".stripMargin),

    "q22_exact_dedup" -> """SELECT MIN(doc_id) AS doc_id, text
      |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,

    "q23_ngram_jaccard" ->
      (Dedup.ngramJaccardPairsSql(3, 0.5) + "\nORDER BY id_a, id_b"),

    // LSH filter-verify output == exhaustive true-Jaccard ground truth
    // (recall argument at the queries entry).
    "q24_minhash_pairs" ->
      (Dedup.trueJaccardPairsSql(3, 0.5) + "\nORDER BY id_a, id_b"),

    // Exact twin: per-token md5_number_upper == the kernel's MD5-derived
    // hash bit-for-bit, so the all-pairs Hamming filter reproduces the
    // banded pipeline's output identically.
    "q25_simhash_pairs" ->
      (Dedup.simhashNearDupSql(3) + "\nORDER BY id_a, id_b"),

    "q26_brute_topk" -> s"""WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS q_emb
      |  FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS neighbor_id, embedding AS c_emb FROM embeddings),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |    ${Similarity.Sql.cosine("q_emb", "c_emb")} AS cosine
      |  FROM c JOIN q ON query_id != neighbor_id)
      |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, neighbor_id) AS rank FROM scored) t
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q126_hybrid_rrf" ->
      (Retrieval.hybridRrfTopKSql() + "\nORDER BY query_id, rank"),

    "q127_dsir_select" ->
      graft.operators.Selection.dsirSelectSql(topN = 100),

    "q129_ohlc_bars" ->
      (EventAnalytics.ohlcBarsSql() + "\nORDER BY bucket, event_type"),

    "q131_psi_drift" -> graft.operators.Drift.psiSql(binWidth = 50.0),

    "q132_phrase_detect" ->
      CorpusStats.phraseScoresSql(minCount = 5L, delta = 5.0, k = 30),

    "q134_vocab_drift" -> graft.operators.Drift.vocabDriftSql(),

    // Sized layout is answer-invariant: the oracle is the source.
    "q133_sized_write" -> """SELECT l_orderkey, l_linenumber, l_quantity,
      |  l_extendedprice
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // Same closed-form replay as q125, restricted to the written ids.
    "q130_binary_media_ingest" ->
      (Multimodal.sampleVideoSql(docPredicate = "doc_id < 200") +
        "\nORDER BY media_id"),

    "q128_hard_negatives" ->
      (Retrieval.hardNegativesSql() + "\nORDER BY query_id, rank"),

    "q27_embedding_near_dup" -> s"""SELECT id_a, id_b, cosine FROM (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    ${Similarity.Sql.cosine("a.embedding", "b.embedding")} AS cosine
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) p
      |WHERE cosine >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    // Deterministic centroids (every 53rd vec) let the oracle replay the
    // exact IVF cell assignment: nearest cell per corpus vector, top-3
    // cells per query, cell-local scoring, per-query top-5.
    "q28_ivf_topk" -> s"""$ivfChainCtes,
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |    ${Similarity.Sql.cosine("q_emb", "c_emb")} AS cosine
      |  FROM corpus_cells JOIN query_cells USING (cent_id)
      |  WHERE query_id != neighbor_id)
      |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, neighbor_id) AS rank FROM scored) t
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q29_text_features" -> {
      import TextFunctions.{Sql => T}
      s"""SELECT doc_id,
        |  CAST(${T.tokenCount("text")} AS INTEGER) AS n_tokens,
        |  CAST(${T.bpeTokenCount("text")} AS INTEGER) AS n_bpe_tokens,
        |  ${T.punctRatio("text")} AS punct_ratio,
        |  ${T.stopwordRatio("text")} AS stopword_ratio,
        |  ${T.qualityScore("text")} AS quality,
        |  ${T.langId("text")} AS lang_id,
        |  ${T.fingerprintMd5("text")} AS fp_md5,
        |  ${T.fingerprintPoly("text")} AS fp_poly
        |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q30_media_decode" ->
      (Multimodal.decodeSql + "\nORDER BY media_id"),

    "q118_audio_decode" ->
      (Multimodal.decodeAudioSql + "\nORDER BY media_id"),

    "q125_video_frames" ->
      (Multimodal.sampleVideoSql() + "\nORDER BY media_id"),

    // CSV round-trips are exact (Double.toString ↔ parseDouble, ISO
    // dates), so the oracle reads the parquet source directly.
    "q31_csv_ingest" -> """SELECT l_orderkey, l_linenumber, l_quantity,
      |  CAST(l_shipdate AS DATE) AS ship_date
      |FROM lineitem WHERE l_orderkey < 1000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q32_sink_roundtrip" -> s"""$airlineMonthlyCte
      |SELECT airline_name, month, depdel15_count,
      |  CAST(depdel15_sum AS BIGINT) AS depdel15_sum,
      |  delay_minutes_mean,
      |  CAST(is_cancelled_sum AS BIGINT) AS is_cancelled_sum,
      |  carrier_delay_sum, weather_delay_sum, nas_delay_sum,
      |  late_aircraft_delay_sum, on_time_rate
      |FROM am ORDER BY airline_name, month""".stripMargin,

    "q33_csv_sink" -> s"""$airportPerfCte
      |SELECT airline_name, month, origin_city, total_flights,
      |  CAST(delayed_flights AS BIGINT) AS delayed_flights
      |FROM ap ORDER BY airline_name, month, origin_city""".stripMargin,

    "q34_ctas" -> """SELECT airport_key, n_name AS city,
      |  n_regionkey AS state_key
      |FROM (SELECT c_nationkey AS airport_key FROM customer
      |      UNION SELECT s_nationkey FROM supplier) u
      |JOIN nation ON u.airport_key = nation.n_nationkey
      |ORDER BY airport_key""".stripMargin,

    "q35_time_format_masked" -> """WITH base AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CASE WHEN l_linenumber % 3 = 0 THEN NULL
      |      ELSE CAST((l_orderkey * 7 + l_linenumber) % 2401 AS INTEGER)
      |    END AS hhmm
      |  FROM lineitem),
      |fmt AS (SELECT *, regexp_replace(lpad(CAST(CAST(COALESCE(hhmm, 0)
      |    AS INTEGER) AS VARCHAR), 4, '0'), '^2400$', '0000') AS t FROM base)
      |SELECT l_orderkey, l_linenumber, hhmm,
      |  CASE WHEN hhmm IS NOT NULL
      |    THEN substr(t, 1, 2) || ':' || substr(t, 3, 2) END AS dep_time
      |FROM fmt ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q36_event_windows" -> s"""SELECT window_start, event_type,
      |  n_events, CAST(n_delayed AS BIGINT) AS n_delayed, total_value
      |FROM (${EventStream.windowedKpisSql()})
      |ORDER BY window_start, event_type""".stripMargin,

    // Connected components as a recursive transitive closure (exhaustive
    // — fine at oracle scale; the Spark side is the scale path).
    "q37_dedup_clusters" -> s"""WITH RECURSIVE pairs AS (
      |${Dedup.trueJaccardPairsSql(3, 0.5)}
      |), edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs
      |), reach AS (
      |  SELECT DISTINCT src AS id, src AS r FROM edges
      |  UNION
      |  SELECT e.src AS id, reach.r FROM reach JOIN edges e ON e.dst = reach.id
      |)
      |SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
      |ORDER BY id""".stripMargin,

    "q38_dedup_survivors" -> s"""WITH RECURSIVE pairs AS (
      |${Dedup.trueJaccardPairsSql(3, 0.5)}
      |), edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs
      |), reach AS (
      |  SELECT DISTINCT src AS id, src AS r FROM edges
      |  UNION
      |  SELECT e.src AS id, reach.r FROM reach JOIN edges e ON e.dst = reach.id
      |), clusters AS (
      |  SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
      |)
      |SELECT doc_id FROM documents
      |WHERE doc_id NOT IN (SELECT id FROM clusters WHERE id <> cluster_id)
      |ORDER BY doc_id""".stripMargin,

    "q39_curation" -> {
      import TextFunctions.{Sql => T}
      s"""WITH RECURSIVE curated AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE ${T.qualityScore("text")} >= 0.5 AND ${T.langId("text")} = 'en'
        |), pairs AS (
        |${Dedup.trueJaccardPairsSql(3, 0.5, from = "curated")}
        |), edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |), reach AS (
        |  SELECT DISTINCT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT e.src AS id, reach.r FROM reach JOIN edges e ON e.dst = reach.id
        |), clusters AS (
        |  SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
        |)
        |SELECT doc_id FROM curated
        |WHERE doc_id NOT IN (SELECT id FROM clusters WHERE id <> cluster_id)
        |ORDER BY doc_id""".stripMargin
    },

    "q40_token_budget" ->
      (Curation.tokenBudgetSampleSql(20000L) + "\nORDER BY doc_id"),

    // The JDBC roundtrip must hand back exactly the airline-monthly
    // rollup — same oracle as q02/q32.
    "q41_jdbc_roundtrip" -> s"""$airlineMonthlyCte
      |SELECT airline_name, month, depdel15_count,
      |  CAST(depdel15_sum AS BIGINT) AS depdel15_sum,
      |  delay_minutes_mean,
      |  CAST(is_cancelled_sum AS BIGINT) AS is_cancelled_sum,
      |  carrier_delay_sum, weather_delay_sum, nas_delay_sum,
      |  late_aircraft_delay_sum, on_time_rate
      |FROM am ORDER BY airline_name, month""".stripMargin,

    "q42_sessionization" ->
      (EventStream.sessionsBatchSql(30) + "\nORDER BY user_id, session_idx"),

    // Exhaustive all-pairs ground truth — prefix filtering must reproduce
    // it exactly (recall by pigeonhole, precision by the verify join).
    "q43_prefix_jaccard" ->
      (Dedup.trueJaccardPairsSql(3, 0.5) + "\nORDER BY id_a, id_b"),

    // The plain join — salting must not change a single bit of the result.
    "q44_salted_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
         |  ${Aggregates.sumExactSql("l_quantity")} AS qty_sum
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,

    "q45_srp_near_dup" ->
      (Similarity.srpNearDupSql(0.4) + "\nORDER BY id_a, id_b"),

    "q46_split_assign" ->
      s"""SELECT doc_id, ${Sampling.assignSplitsSql("text")}
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q47_corpus_profile" ->
      (Curation.corpusProfileSql() + "\nORDER BY lang"),

    // Round-trips must reproduce the source table exactly.
    "q48_jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",
    "q49_orc_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",

    "q147_xml_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",

    "q50_pivot" -> s"""$airlineMonthlyCte
      |${Aggregates.onTimePivotSql}
      |ORDER BY airline_name""".stripMargin,

    "q51_rollup" -> (withWide(Aggregates.delayRollupSql) +
      "\nORDER BY airline_name, month"),

    // The naive range-join + argmax spelling of the as-of join (fine at
    // oracle scale; the Spark side must never plan this shape).
    "q52_asof_join" ->
      s"""WITH p AS (SELECT user_id, event_id AS purchase_id,
         |    ts AS purchase_ts FROM events WHERE event_type = 'purchase'),
         |v AS (SELECT user_id, ts AS view_ts, event_id AS view_id
         |  FROM events WHERE event_type = 'view'),
         |j AS (SELECT purchase_id, p.user_id, purchase_ts, view_id, view_ts,
         |    row_number() OVER (PARTITION BY purchase_id
         |      ORDER BY view_ts DESC, view_id DESC) AS rn
         |  FROM p JOIN v ON p.user_id = v.user_id
         |    AND v.view_ts <= p.purchase_ts)
         |SELECT purchase_id, user_id, purchase_ts, view_id, view_ts,
         |  CAST(epoch_us(purchase_ts) - epoch_us(view_ts) AS BIGINT) AS gap_us
         |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin,

    // Identical to q52's oracle — the skew-safe construction must be
    // bit-identical to the plain one.
    "q104_asof_skewsafe" ->
      s"""WITH p AS (SELECT user_id, event_id AS purchase_id,
         |    ts AS purchase_ts FROM events WHERE event_type = 'purchase'),
         |v AS (SELECT user_id, ts AS view_ts, event_id AS view_id
         |  FROM events WHERE event_type = 'view'),
         |j AS (SELECT purchase_id, p.user_id, purchase_ts, view_id, view_ts,
         |    row_number() OVER (PARTITION BY purchase_id
         |      ORDER BY view_ts DESC, view_id DESC) AS rn
         |  FROM p JOIN v ON p.user_id = v.user_id
         |    AND v.view_ts <= p.purchase_ts)
         |SELECT purchase_id, user_id, purchase_ts, view_id, view_ts,
         |  CAST(epoch_us(purchase_ts) - epoch_us(view_ts) AS BIGINT) AS gap_us
         |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin,

    // Same cache-table twin as q33 — compaction must be content-neutral.
    "q105_compact_roundtrip" -> s"""$airportPerfCte
      |SELECT airline_name, month, origin_city, total_flights,
      |  CAST(delayed_flights AS BIGINT) AS delayed_flights
      |FROM ap ORDER BY airline_name, month, origin_city""".stripMargin,

    "q106_trend_fit" -> (withWide(Aggregates.delayTrendFitSql) +
      "\nORDER BY airline_name"),

    // The oracle reads the SAME pre-join fact (months 1-3 of shipdate);
    // the runtime-pruned scan must agree with the static spelling.
    "q107_dpp_quarter" ->
      s"""SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
         |  count(*) AS n,
         |  ${Aggregates.sumExactSql("l_quantity")} AS qty_sum
         |FROM lineitem WHERE month(l_shipdate) BETWEEN 1 AND 3
         |GROUP BY 1 ORDER BY ship_month""".stripMargin,

    "q108_scd2_build" ->
      s"""WITH scd AS (${graft.operators.Merge.scd2Sql("orders",
             "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")})
         |SELECT o_custkey, o_orderstatus,
         |  CAST(eff_from AS DATE) AS eff_from,
         |  CAST(eff_to AS DATE) AS eff_to, is_current
         |FROM scd
         |ORDER BY o_custkey, eff_from, o_orderstatus, eff_to NULLS LAST"""
        .stripMargin,

    "q109_regional_revenue" ->
      (StarSchema.regionalRevenueSql("ASIA", 1997) +
        "\nORDER BY revenue DESC, n_name"),

    "q111_grouping_sets" ->
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         |  COALESCE(o_orderpriority, 'ALL') AS priority,
         |  COUNT(*) AS n,
         |  ${Aggregates.sumExactSql("o_totalprice")} AS revenue
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY status, priority""".stripMargin,

    "q112_variant_extract" ->
      s"""SELECT event_type, CAST(FLOOR(k / 10.0) AS INTEGER) AS bucket,
         |  COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS k_sum
         |FROM (SELECT event_type,
         |    CAST(json_extract(props, '$$.k') AS BIGINT) AS k FROM events) t
         |GROUP BY 1, 2
         |ORDER BY event_type, bucket NULLS FIRST""".stripMargin,

    // The oracle is the CORRECT aggregate: static overwrite loses months,
    // append doubles month 6 — only per-partition replacement matches.
    "q115_dynamic_overwrite" -> s"""$airportPerfCte
      |SELECT CAST(month AS INTEGER) AS month, airline_name,
      |  ${Aggregates.sumExactSql("total_flights")} AS flights,
      |  ${Aggregates.sumExactSql("delayed_flights")} AS delayed
      |FROM ap GROUP BY 1, 2 ORDER BY month, airline_name""".stripMargin,

    // Exactly-once proof: a re-processed batch 1 would duplicate rows.
    "q116_incremental_ingest" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    // MERGE-sink proof: the two-run fold must equal the global
    // newest-per-user (event_id is unique, so the window is total).
    "q123_upsert_sink" ->
      """SELECT user_id, event_id, event_type, value
        |FROM (SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY event_id DESC) AS rn
        |  FROM events) _
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // Bucketed layout is answer-invariant: the oracle is the plain join.
    "q124_bucketed_join" ->
      s"""SELECT o_orderstatus,
         |  ${Aggregates.sumExactSql("l_quantity")} AS total_qty,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,

    "q119_key_skew" ->
      graft.operators.Profiling.keySkewSql("orders", "o_custkey", topN = 20),

    "q120_approx_count" ->
      s"""SELECT CAST(month(l_shipdate) AS INTEGER) AS month,
         |  COUNT(*) AS n_sampled, CAST(COUNT(*) * 8 AS BIGINT) AS n_est
         |FROM lineitem
         |WHERE ${Sampling.bucketSql(
               "CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)",
               1024)} < 128
         |GROUP BY 1 ORDER BY month""".stripMargin,

    "q117_pq_topk" -> Similarity.pqTopKSql(k = 5, m = 16, subDim = 4,
      initStride = 3, iters = 1),

    "q121_ivfpq_topk" -> Similarity.ivfPqTopKSql(k = 5,
      cellStride = 53, cellIters = 1, nProbe = 3,
      m = 16, subDim = 4, pqStride = 3, pqIters = 1),

    // The stored-index queries replay the TRAINING chain in SQL with
    // the exact build parameters: the persisted codebook/codes/cells
    // are bit-equal to what the inline twins train (float32 parquet
    // round-trips exactly; SimilaritySpec asserts frame equality), so
    // the inline replay IS the stored index's oracle — a hash match
    // here proves the persisted index reproduces the training.
    "q135_pq_stored_index" -> Similarity.pqTopKSql(k = 5, m = 16,
      subDim = 4, initStride = 3, iters = 1),

    "q136_ivfpq_stored_index" -> Similarity.ivfPqTopKSql(k = 5,
      cellStride = 53, cellIters = 1, nProbe = 3,
      m = 16, subDim = 4, pqStride = 3, pqIters = 1),

    // The append twins: training restricted to the even half (the
    // frozen-codebook replay), encode/query over everyone — what the
    // build-on-evens + append-odds index must equal bit-for-bit.
    "q137_pq_index_append" -> Similarity.pqTopKSql(k = 5, m = 16,
      subDim = 4, initStride = 3, iters = 1,
      trainPred = "vec_id % 2 = 0"),

    "q138_ivfpq_index_append" -> Similarity.ivfPqTopKSql(k = 5,
      cellStride = 53, cellIters = 1, nProbe = 3,
      m = 16, subDim = 4, pqStride = 3, pqIters = 1,
      trainPred = "vec_id % 2 = 0"),

    "q139_semdedup" -> Similarity.semDeDupSql(threshold = 0.35,
      centStride = 53),

    "q140_bpe_train" -> graft.operators.CorpusStats.bpeTrainSql(rounds = 10),

    "q141_phash_neardup" ->
      (graft.operators.ImageDedup.phashNearDupSql(maxHamming = 3) +
        "\nORDER BY id_a, id_b"),

    "q142_bpe_vocab" ->
      graft.operators.CorpusStats.bpeVocabSql(rounds = 10),

    "q146_bpe_tokenize" ->
      graft.operators.CorpusStats.bpeTokenizeSql(rounds = 10),

    "q143_phash_survivors" ->
      graft.operators.ImageDedup.phashSurvivorsSql(maxHamming = 3),

    "q144_phash_cross" ->
      graft.operators.ImageDedup.phashAcrossSql(maxHamming = 3),

    "q145_multimodal_curation" ->
      graft.operators.ImageDedup.curatedDocsSql(maxHamming = 3,
        minQuality = 0.5,
        qualityExpr =
          s"(${graft.functions.TextFunctions.Sql.qualityScore("d.text")})"),

    "q122_rolling_dau" ->
      (graft.operators.EventAnalytics.rollingDistinctUsersSql(7) +
        "\nORDER BY day"),

    "q114_stream_static" ->
      s"""WITH dim AS (SELECT user_id,
         |    ${Aggregates.sumExactSql("value")} AS ltv
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
         |SELECT event_type,
         |  CASE WHEN ltv IS NULL THEN 'none'
         |       WHEN ltv >= 500.0 THEN 'high'
         |       WHEN ltv >= 100.0 THEN 'mid'
         |       ELSE 'low' END AS ltv_band,
         |  COUNT(*) AS n
         |FROM events LEFT JOIN dim USING (user_id)
         |GROUP BY 1, 2 ORDER BY event_type, ltv_band""".stripMargin,

    "q113_unpivot" ->
      s"""WITH agg AS (SELECT o_orderstatus,
         |    ${Aggregates.sumExactSql("o_totalprice")} AS revenue,
         |    CAST(COUNT(*) AS DOUBLE) AS n_orders
         |  FROM orders GROUP BY 1)
         |SELECT o_orderstatus, metric, value FROM agg
         |UNPIVOT (value FOR metric IN (revenue, n_orders))
         |ORDER BY o_orderstatus, metric""".stripMargin,

    "q110_ivf_near_dup" -> s"""WITH
      |cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
      |          FROM embeddings WHERE vec_id % 53 = 0),
      |cc AS (
      |  SELECT vec_id, embedding, cent_id FROM (
      |    SELECT e.vec_id, e.embedding, c.cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${Similarity.Sql.cosine("e.embedding", "c.cent_emb")} DESC,
      |          c.cent_id) AS r
      |    FROM embeddings e CROSS JOIN cents c) t WHERE r = 1)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  ${Similarity.Sql.cosine("a.embedding", "b.embedding")} AS cosine
      |FROM cc a JOIN cc b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      |WHERE ${Similarity.Sql.cosine("a.embedding", "b.embedding")} >= 0.35
      |ORDER BY id_a, id_b""".stripMargin,

    "q103_asof_forward" ->
      s"""WITH p AS (SELECT user_id, event_id AS purchase_id,
         |    ts AS purchase_ts FROM events WHERE event_type = 'purchase'),
         |v AS (SELECT user_id, ts AS view_ts, event_id AS view_id
         |  FROM events WHERE event_type = 'view'),
         |j AS (SELECT purchase_id, p.user_id, purchase_ts, view_id, view_ts,
         |    row_number() OVER (PARTITION BY purchase_id
         |      ORDER BY view_ts ASC, view_id DESC) AS rn
         |  FROM p JOIN v ON p.user_id = v.user_id
         |    AND v.view_ts >= p.purchase_ts)
         |SELECT purchase_id, user_id, purchase_ts, view_id, view_ts,
         |  CAST(epoch_us(view_ts) - epoch_us(purchase_ts) AS BIGINT) AS gap_us
         |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin,

    // The naive inequality-join spelling of the interval join.
    "q53_interval_join" ->
      s"""WITH hourly AS (SELECT date_trunc('hour', ts) AS w_start,
         |    count(*) AS n FROM events GROUP BY 1),
         |surge AS (SELECT w_start, w_start + INTERVAL 90 MINUTE AS w_end
         |  FROM hourly WHERE n >= 1.3 * (SELECT avg(n) FROM hourly))
         |SELECT s.w_start, count(*) AS n_events,
         |  CAST(SUM(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_errors,
         |  ${Aggregates.sumExactSql("e.value")} AS value_sum
         |FROM events e JOIN surge s
         |  ON e.ts >= s.w_start AND e.ts < s.w_end
         |GROUP BY s.w_start ORDER BY s.w_start""".stripMargin,

    "q54_repetition" ->
      (CorpusStats.repetitionMetricsSql() + "\nORDER BY doc_id"),

    "q55_tfidf" -> (CorpusStats.tfidfTop1Sql() + "\nORDER BY doc_id"),

    "q56_vocab_prune" ->
      (CorpusStats.vocabPruneSql(0.75) + "\nORDER BY doc_id"),

    "q57_anonymize" ->
      (Privacy.anonymizeCustomersSql(5) + "\nORDER BY pseudo_id"),

    "q58_mom_delta" -> s"""$airlineMonthlyCte
      |${Aggregates.momDeltaSql}
      |ORDER BY airline_name, month""".stripMargin,

    "q59_cube" -> (withWide(Aggregates.delayCubeSql) +
      "\nORDER BY airline_name, month"),

    "q60_percentiles" -> (withWide(Aggregates.delayPercentilesSql) +
      "\nORDER BY airline_name"),

    "q61_outlier_trim" -> (withWide(Aggregates.outlierTrimSql) +
      "\nORDER BY airline_name"),

    "q62_attribution" -> (EventStream.attributionJoinSql(2880) +
      "\nORDER BY purchase_id, view_id"),

    "q63_upsert" -> (Merge.upsertSql(
      targetSql = custTotalsSql("month(o_orderdate) <= 11"),
      sourceSql = custTotalsSql("o_custkey IN (SELECT DISTINCT o_custkey " +
        "FROM orders WHERE month(o_orderdate) = 12)"),
      key = "o_custkey", cols = "o_custkey, n_orders, total_spend") +
      "\nORDER BY o_custkey"),

    "q64_funnel" -> EventAnalytics.funnelSql,

    "q65_retention" -> (EventAnalytics.retentionSql(7) + "\nORDER BY day"),

    "q66_histogram" -> withWide(
      """SELECT CAST(bin * 50 AS DOUBLE) AS bin_lo, n FROM (
        |  SELECT CAST(floor(delay_minutes / 50) AS BIGINT) AS bin,
        |    COUNT(*) AS n
        |  FROM wide GROUP BY 1) _
        |ORDER BY bin_lo""".stripMargin),

    // The exact half of the sketch check is replayed; the sketch error
    // contracts ride as literal-TRUE invariants — a Spark sketch that
    // drifted out of its published bound flips the boolean and fails
    // the hash compare (see the q67/q102 registration scaladoc).
    "q67_sketches" ->
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS hll_ok, TRUE AS p50_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q68_quality_report" ->
      (QualityReport.ordersAuditSql() + "\nORDER BY check_name"),

    "q102_heavy_hitters" ->
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
        |  FROM events GROUP BY user_id)
        |SELECT user_id, exact_cnt, TRUE AS est_ge_exact,
        |  TRUE AS est_within_eps
        |FROM c ORDER BY exact_cnt DESC, user_id ASC LIMIT 20""".stripMargin,

    "q69_schema_evolution" ->
      """SELECT doc_id, text, lang, CAST(NULL AS VARCHAR) AS source,
        |  CAST(NULL AS BIGINT) AS n_chars
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, text, lang, source, n_chars
        |FROM documents WHERE doc_id % 2 = 1
        |ORDER BY doc_id""".stripMargin,

    "q70_snapshot_diff" -> (Merge.snapshotDiffSql(
      beforeSql = custTotalsSql("month(o_orderdate) <= 11"),
      afterSql = custTotalsSql("1 = 1"),
      key = "o_custkey", cols = Seq("n_orders", "total_spend")) +
      "\nORDER BY o_custkey"),

    "q71_packing" ->
      (Curation.packSequencesSql(2048) + "\nORDER BY doc_id"),

    "q72_session_window" -> (EventStream.sessionsViaSessionWindowSql(30) +
      "\nORDER BY user_id, session_start"),

    "q73_auto_interval_join" ->
      s"""WITH hourly AS (SELECT date_trunc('hour', ts) AS w_start,
         |    count(*) AS n FROM events GROUP BY 1),
         |surge AS (SELECT w_start, w_start + INTERVAL 90 MINUTE AS w_end
         |  FROM hourly WHERE n >= 1.3 * (SELECT avg(n) FROM hourly))
         |SELECT s.w_start, count(*) AS n_events,
         |  ${Aggregates.sumExactSql("e.value")} AS value_sum
         |FROM events e JOIN surge s
         |  ON e.ts >= s.w_start AND e.ts < s.w_end
         |GROUP BY s.w_start ORDER BY s.w_start""".stripMargin,

    "q74_islands" -> (EventAnalytics.activityIslandsSql +
      "\nORDER BY user_id, start_day"),

    "q75_mode" -> (withWide(Aggregates.modeOriginCitySql) +
      "\nORDER BY airline_name"),

    "q76_deciles" -> s"""$airlineMonthlyCte
      |${Aggregates.delayDecilesSql}
      |ORDER BY airline_name""".stripMargin,

    "q77_corr" -> (withWide(Aggregates.delayPriceCorrSql) +
      "\nORDER BY airline_name"),

    "q78_pareto" -> (withWide(Aggregates.delayParetoSql) +
      "\nORDER BY cum_share ASC, airline_name ASC"),

    "q79_json_extract" ->
      """SELECT event_type,
        |  count(k) AS n_k, CAST(sum(k) AS BIGINT) AS k_sum,
        |  min(k) AS k_min, max(k) AS k_max
        |FROM (SELECT event_type,
        |    CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |  FROM events) _
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q80_quota_sample" ->
      s"""SELECT doc_id, lang FROM (SELECT doc_id, lang,
         |    ${Sampling.quotaRankSql("lang", "text")} AS rn
         |  FROM documents) _
         |WHERE rn <= 50 ORDER BY doc_id""".stripMargin,

    "q81_pair_stats" -> CorpusStats.topPairsSql(20),

    "q82_chunking" ->
      (CorpusStats.chunkSql(16) + "\nORDER BY doc_id, chunk_idx"),

    "q83_mad_outliers" -> (withWide(Aggregates.madOutliersSql) +
      "\nORDER BY airline_name"),

    "q84_nearest_airport" ->
      (Aggregates.nearestAirportSql + "\nORDER BY city"),

    "q85_anomalies" -> s"""$airlineMonthlyCte
      |${Aggregates.delayAnomaliesSql}
      |ORDER BY airline_name, month""".stripMargin,

    "q87_topk_exec" -> s"""$airportPerfCte
      |SELECT airline_name, month, origin_city, total_flights,
      |  CAST(delayed_flights AS BIGINT) AS delayed_flights
      |FROM (SELECT *, row_number() OVER (PARTITION BY month
      |    ORDER BY total_flights DESC, airline_name, origin_city) AS rn
      |  FROM ap) _
      |WHERE rn <= 3
      |ORDER BY month, total_flights DESC, airline_name, origin_city"""
      .stripMargin,

    // The plain filtered join — Bloom pruning must not change one bit.
    "q88_bloom_join" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n,
         |  ${Aggregates.sumExactSql("l_quantity")} AS qty_sum
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin,

    "q89_fuzzy_join" ->
      (Dedup.editDistancePairsSql("customer", "c_name") +
        "\nORDER BY name_a, name_b"),

    "q90_gap_fill" ->
      (Aggregates.monthlyLocfSql("orders", "o_custkey", "o_orderdate",
        Aggregates.sumExactSql("o_totalprice"), "spend_locf") +
        "\nORDER BY o_custkey, month"),

    "q91_zorder" ->
      s"""WITH d AS (SELECT o_orderkey, o_custkey AS x,
         |  datediff('day', TIMESTAMP '1970-01-01', o_orderdate) AS y
         |  FROM orders)
         |SELECT o_orderkey, ${Sinks.zValueSql("x", "y")} AS zval
         |FROM d ORDER BY zval, o_orderkey""".stripMargin,

    "q92_path_trigrams" -> EventAnalytics.pathTrigramsSql(20),

    "q93_csv_parallel_sink" -> s"""$airportPerfCte
      |SELECT airline_name, month, origin_city, total_flights,
      |  CAST(delayed_flights AS BIGINT) AS delayed_flights
      |FROM ap ORDER BY airline_name, month, origin_city""".stripMargin,

    "q94_pii_scrub" -> s"""WITH aug AS (SELECT doc_id,
      |    text || ' contact u' || CAST(doc_id AS VARCHAR) ||
      |    '@ex.org call 555-123-' ||
      |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      |  FROM documents)
      |SELECT doc_id, ${Privacy.ScrubSql.scrubbed("text")} AS text,
      |  ${Privacy.ScrubSql.emailCount("text")} AS n_emails,
      |  ${Privacy.ScrubSql.phoneCount("text")} AS n_phones
      |FROM aug ORDER BY doc_id""".stripMargin,

    "q95_decontamination" -> Curation.decontaminateSql(n = 8, benchMod = 97),

    "q96_unigram_logprob" -> CorpusStats.unigramLogProbSql(),

    "q97_embedding_quantize" -> Similarity.quantizeEmbeddingsSql,

    "q98_cross_corpus_dedup" -> Dedup.trueJaccardAcrossSql(3, 0.5, refMod = 3),

    "q99_temperature_mix" -> Sampling.temperatureMixSampleSql(20000L),

    "q100_packed_examples" -> Curation.materializePackedSequencesSql(2048L),

    "q101_jsonl_roundtrip" -> """SELECT doc_id, lang, text FROM documents
      |WHERE doc_id < 300 ORDER BY doc_id""".stripMargin,

    "q86_incremental_agg" -> {
      def totalsDec(pred: String) =
        s"""SELECT o_custkey, COUNT(*) AS n_orders,
           |  SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS spend_dec
           |FROM orders WHERE $pred GROUP BY o_custkey""".stripMargin
      s"""SELECT o_custkey, n_orders,
         |  CAST(spend_dec AS DOUBLE) AS total_spend FROM (
         |${Merge.combineAdditiveSql(
          totalsDec("month(o_orderdate) <= 11"),
          totalsDec("month(o_orderdate) = 12"),
          "o_custkey", Seq("n_orders", "spend_dec"))}) _
         |ORDER BY o_custkey""".stripMargin
    },

    // The stored-state twins replay the same ground truth as their
    // inline counterparts: persistence must be bit-invisible.
    "q148_minhash_stored_dedup" ->
      Dedup.trueJaccardAcrossSql(3, 0.5, refMod = 3),

    "q149_phash_stored_dedup" ->
      graft.operators.ImageDedup.phashAcrossSql(maxHamming = 3),

    "q150_bpe_apply_stored" -> CorpusStats.bpeApplyFromModelSql(
      rounds = 10, trainPred = "doc_id % 3 = 0", applyPred = "doc_id % 3 <> 0"),

    "q151_winnowing_spans" ->
      (Dedup.winnowedSpanPairsSql(k = 24, w = 10) +
        "\nORDER BY id_a, id_b"),

    "q152_boilerplate_excision" ->
      Dedup.exciseBoilerplateSql(k = 24, minDf = 3),

    "q153_decontam_excision" ->
      Dedup.exciseContaminatedSql(k = 24,
        trainPred = "doc_id % 3 != 0", evalPred = "doc_id % 3 = 0"),

    "q154_bigram_logprob" -> CorpusStats.bigramLogProbSql(
      refPred = "doc_id % 3 = 0", scorePred = "doc_id % 3 != 0"),

    // The q26 brute chain and the q28 IVF chain side by side, joined on
    // (query_id, neighbor_id) for the per-query hit count.
    "q155_ann_recall" -> s"""$annEvalCtes
      |SELECT iv.query_id,
      |  CAST(SUM(CASE WHEN bt.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_hits,
      |  CAST(SUM(CASE WHEN bt.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
      |    AS DOUBLE) / 5 AS recall
      |FROM iv LEFT JOIN bt USING (query_id, neighbor_id)
      |GROUP BY iv.query_id ORDER BY query_id""".stripMargin,

    "q163_ann_mrr" -> s"""$annEvalCtes
      |SELECT iv.query_id,
      |  CAST(MIN(CASE WHEN bt.neighbor_id IS NOT NULL THEN iv.rank END)
      |    AS BIGINT) AS first_hit,
      |  CASE WHEN MIN(CASE WHEN bt.neighbor_id IS NOT NULL THEN iv.rank END)
      |      IS NULL THEN 0.0
      |    ELSE 1.0 / MIN(CASE WHEN bt.neighbor_id IS NOT NULL
      |      THEN iv.rank END) END AS mrr
      |FROM iv LEFT JOIN bt USING (query_id, neighbor_id)
      |GROUP BY iv.query_id ORDER BY query_id""".stripMargin,

    // The q37 component chain, then every doc joined to its
    // representative's q46 split columns.
    "q156_cluster_safe_splits" -> s"""WITH RECURSIVE pairs AS (
      |${Dedup.trueJaccardPairsSql(3, 0.5)}
      |), edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs
      |), reach AS (
      |  SELECT DISTINCT src AS id, src AS r FROM edges
      |  UNION
      |  SELECT e.src AS id, reach.r FROM reach JOIN edges e ON e.dst = reach.id
      |), clusters AS (
      |  SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
      |), withrep AS (
      |  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      |  FROM documents d LEFT JOIN clusters c ON c.id = d.doc_id
      |), repsplit AS (
      |  SELECT doc_id AS cluster_id, ${Sampling.assignSplitsSql("text")}
      |  FROM documents)
      |SELECT w.doc_id, w.cluster_id, r.bucket, r.split
      |FROM withrep w JOIN repsplit r USING (cluster_id)
      |ORDER BY w.doc_id""".stripMargin,

    "q157_cdc_chunk_dedup" -> Dedup.cdcSharedChunkStatsSql(k = 16),

    "q158_bpe_fertility" -> CorpusStats.bpeFertilityByLangSql(
      rounds = 10, trainPred = "doc_id % 3 = 0", applyPred = "doc_id % 3 <> 0"),

    "q159_embedding_drift" -> graft.operators.Drift.embeddingDriftSql(nBits = 6),

    "q160_source_copy_matrix" -> Dedup.copyMatrixSql(n = 3, threshold = 0.5),

    "q161_audio_neardup" -> Multimodal.audioNearDupSql(),

    "q162_decontam_stored_excision" ->
      Dedup.exciseContaminatedSql(k = 24,
        trainPred = "doc_id % 3 != 0", evalPred = "doc_id % 3 = 0"),

    // Each streamed batch's PSI vs the stored reference == the batch
    // twin with the matching predicates.
    "q164_stream_drift_monitor" -> s"""SELECT * FROM (
      |  SELECT CAST(1 AS BIGINT) AS batch_id, d1.* FROM (
      |${graft.operators.Drift.embeddingDriftSql(nBits = 6,
          refPred = "vec_id % 3 = 0", curPred = "vec_id % 3 = 1")}) d1
      |  UNION ALL
      |  SELECT CAST(2 AS BIGINT) AS batch_id, d2.* FROM (
      |${graft.operators.Drift.embeddingDriftSql(nBits = 6,
          refPred = "vec_id % 3 = 0", curPred = "vec_id % 3 = 2")}) d2)
      |ORDER BY batch_id""".stripMargin,

    "q165_filter_funnel" -> {
      import TextFunctions.{Sql => T}
      Curation.filterFunnelSql(Seq(
        "min_tokens" -> s"${T.tokenCount("text")} >= 10",
        "quality" -> s"${T.qualityScore("text")} >= 0.3",
        "punct" -> s"${T.punctRatio("text")} <= 0.2",
        "stopwords" -> s"${T.stopwordRatio("text")} >= 0.05"))
    },

    "q166_ngram_novelty" -> Curation.ngramNoveltySql(n = 8,
      docPred = "doc_id % 3 != 0", refPred = "doc_id % 3 = 0"),

    "q167_curation_report" -> {
      import TextFunctions.{Sql => T}
      Curation.filterFunnelSql(
        gates = Seq(
          "near_dup_survivor" -> "surv",
          "min_tokens" -> s"${T.tokenCount("text")} >= 10",
          "quality" -> s"${T.qualityScore("text")} >= 0.3"),
        prelude = s"""RECURSIVE pairs AS (
          |${Dedup.trueJaccardPairsSql(3, 0.5)}
          |), edges AS (
          |  SELECT id_a AS src, id_b AS dst FROM pairs
          |  UNION ALL SELECT id_b, id_a FROM pairs
          |), reach AS (
          |  SELECT DISTINCT src AS id, src AS r FROM edges
          |  UNION
          |  SELECT e.src AS id, reach.r FROM reach JOIN edges e ON e.dst = reach.id
          |), clusters AS (
          |  SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
          |), gated AS (
          |  SELECT d.*, d.doc_id NOT IN
          |    (SELECT id FROM clusters WHERE id <> cluster_id) AS surv
          |  FROM documents d)""".stripMargin,
        from = "gated")
    },

    "q168_quality_classifier" -> QualityClassifier.scoreSql(
      trainPred = "doc_id % 3 = 0", labelExpr = "lang = 'en'",
      applyPred = "doc_id % 3 <> 0"),

    // Stored path == inline path bit-for-bit (spec-asserted), so the
    // SAME train-then-score replay adjudicates the persisted model.
    "q169_quality_stored_score" -> QualityClassifier.scoreSql(
      trainPred = "doc_id % 3 = 0", labelExpr = "lang = 'en'",
      applyPred = "doc_id % 3 <> 0"),

    "q170_byte_bpe_train" -> CorpusStats.byteBpeTrainSql(rounds = 10),

    "q171_byte_bpe_tokenize" -> CorpusStats.byteBpeTokenizeSql(rounds = 10),

    "q172_domain_curation" -> graft.operators.DomainCuration.curationSql(
      blocked = Seq("src0", "src13"), cap = 20, n = 3, threshold = 0.5),

    // Each streamed batch's funnel == the batch twin with the matching
    // predicate, model scores replayed by the q168 train-score chain.
    "q173_stream_funnel_monitor" -> {
      import TextFunctions.{Sql => T}
      def funnelFor(batchPred: String): String = Curation.filterFunnelSql(
        gates = Seq(
          "min_tokens" -> s"${T.tokenCount("text")} >= 10",
          "quality_heuristic" -> s"${T.qualityScore("text")} >= 0.3",
          "model_good" -> "quality_score > 0"),
        prelude = QualityClassifier.scoreChainSql(
          trainPred = "doc_id % 3 = 0", labelExpr = "lang = 'en'",
          applyPred = "doc_id % 3 <> 0") +
          s""",
           |gated AS (SELECT d.doc_id, d.text, s.quality_score
           |  FROM documents d JOIN qc_scored s USING (doc_id)
           |  WHERE $batchPred)""".stripMargin,
        from = "gated")
      s"""SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS batch_id, f1.* FROM (
         |${funnelFor("doc_id % 2 = 1")}) f1
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT) AS batch_id, f2.* FROM (
         |${funnelFor("doc_id % 2 = 0")}) f2)
         |ORDER BY batch_id, stage""".stripMargin
    },

    "q174_byte_bpe_apply_stored" -> CorpusStats.byteBpeApplyFromModelSql(
      rounds = 10, trainPred = "doc_id % 3 = 0",
      applyPred = "doc_id % 3 <> 0"),

    // The union replay IS the oracle: the query trains on half and
    // appends the other half, so the gate proves update == retrain.
    "q175_quality_model_update" -> QualityClassifier.scoreSql(
      trainPred = "doc_id % 3 = 0", labelExpr = "lang = 'en'",
      applyPred = "doc_id % 3 <> 0"),

    "q176_quality_topq_keep" -> {
      val (rk, n) = Sampling.topQuantileRankSql("lang", "quality_score",
        "doc_id")
      "WITH " + QualityClassifier.scoreChainSql(
        trainPred = "doc_id % 3 = 0", labelExpr = "lang = 'en'",
        applyPred = "doc_id % 3 <> 0") +
        s""",
         |scored2 AS (SELECT d.doc_id, d.lang, s.quality_score
         |  FROM documents d JOIN qc_scored s USING (doc_id)
         |  WHERE doc_id % 3 <> 0),
         |r AS (SELECT doc_id, lang, quality_score,
         |    $rk AS rk, $n AS n
         |  FROM scored2)
         |SELECT doc_id, lang, quality_score FROM r
         |WHERE rk <= CEIL(0.25 * n) ORDER BY doc_id""".stripMargin
    },

    "q177_byte_bpe_fertility" -> CorpusStats.byteBpeFertilityByLangSql(
      rounds = 10, trainPred = "doc_id % 3 = 0",
      applyPred = "doc_id % 3 <> 0"),

    "q178_semantic_decontam" -> Similarity.semanticDecontamSql(
      threshold = 0.4, centStride = 53,
      newPred = "vec_id % 3 <> 0", refPred = "vec_id % 3 = 0"),

    "q179_nfc_dedup" -> Curation.nfcVariantDedupSql(),

    "q180_quality_eval" -> QualityClassifier.evaluateSql(
      trainPred = "doc_id % 3 = 0", labelExpr = "lang = 'en'",
      applyPred = "doc_id % 3 <> 0", evalLabelExpr = "d.lang = 'en'"),

    "q181_softdedup_weights" -> Sampling.softDedupWeightsSql(
      n = 3, threshold = 0.5),

    // Bit-equal to q138's build+bulk-append lifecycle over the same
    // vectors (batch boundaries are invisible to the frozen-artifact
    // encoders), so the bulk oracle adjudicates the streamed loop.
    "q182_stream_ann_ingest" -> Similarity.ivfPqTopKSql(k = 5,
      cellStride = 53, cellIters = 1, nProbe = 3,
      m = 16, subDim = 4, pqStride = 3, pqIters = 1,
      trainPred = "vec_id % 2 = 0"),

    "q183_langid_eval" -> {
      import TextFunctions.{Sql => T}
      s"""WITH t AS (SELECT lang, ${T.langId("text")} AS pred_lang
         |  FROM documents),
         |g AS (SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
         |  FROM t GROUP BY lang, pred_lang)
         |SELECT lang, pred_lang, n_docs,
         |  round(CAST(n_docs AS DOUBLE) /
         |    CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE), 6)
         |    AS share
         |FROM g ORDER BY lang, pred_lang""".stripMargin
    },

    // The EXACT decontamination oracle adjudicates the bloom-pruned
    // plan: the filter has no false negatives and its false positives
    // are eliminated by the exact gram join that follows.
    "q184_bloom_decontam" -> Curation.decontaminateSql(n = 8, benchMod = 89),

    "q185_bm25_topk" -> Retrieval.bm25TopKSql(nQueries = 10, k = 5),

    "q186_vocab_growth" -> CorpusStats.vocabGrowthSql(buckets = 10),

    "q187_quality_calibration" -> QualityClassifier.calibrationSql(
      trainPred = "doc_id % 3 = 0", labelExpr = "lang = 'en'",
      applyPred = "doc_id % 3 <> 0", evalLabelExpr = "d.lang = 'en'",
      bins = 10),

    "q188_effective_size" -> Sampling.effectiveCorpusSizeSql(
      n = 3, threshold = 0.5),

    "q189_card_scrub" -> s"""WITH b AS (SELECT doc_id, text,
      |    '4539' || lpad(CAST(doc_id % 100000000 AS VARCHAR), 11, '0')
      |      AS base15 FROM documents),
      |chk AS (SELECT doc_id, text, base15,
      |    (10 - ((${Privacy.luhnSum15Sql("base15")}) % 10)) % 10 AS c
      |  FROM b),
      |aug AS (SELECT doc_id,
      |    text || ' card ' || base15 || CAST(c AS VARCHAR) ||
      |    ' ref ' || base15 || CAST((c + 1) % 10 AS VARCHAR) AS text
      |  FROM chk)
      |SELECT doc_id, ${Privacy.CardSql.scrubbed("text")} AS text,
      |  ${Privacy.CardSql.candidateCount("text")} AS n_card_candidates,
      |  ${Privacy.CardSql.validCount("text")} AS n_cards
      |FROM aug ORDER BY doc_id""".stripMargin,

    "q190_chunking" -> Curation.chunkDocumentsSql(
      windowTokens = 32, strideTokens = 24),

    "q191_zipf_slope" -> CorpusStats.zipfSlopeSql(topK = 100),

    "q192_gopher_lines" ->
      (CorpusStats.gopherLineStatsSql(lineLen = 8, plantMod = 5) +
        "\nORDER BY doc_id"),

    "q193_mojibake_gate" ->
      (Curation.encodingAuditSql() + "\nORDER BY doc_id"),

    "q194_chat_validate" ->
      (graft.operators.ChatData.validateTranscriptsSql() +
        "\nORDER BY doc_id"),

    "q195_url_canonical" ->
      (graft.operators.DomainCuration.canonicalUrlReportSql() +
        "\nORDER BY canonical_url"),

    "q196_dedup_eval" ->
      (Dedup.dedupMethodEvalSql(n = 3, threshold = 0.5) +
        "\nORDER BY method"),

    "q197_html_extract" ->
      (graft.operators.WebText.extractTextSql() + "\nORDER BY doc_id"),

    "q198_line_dedup" ->
      (Dedup.dropBoilerplateLinesSql(lineLen = 8, mod = 3, minDf = 10) +
        "\nORDER BY doc_id"),

    "q199_context_fit" ->
      (Curation.contextFitReportSql(Seq(16, 32, 64)) +
        "\nORDER BY \"window\""),

    "q200_license_audit" ->
      (graft.operators.DomainCuration.licenseAuditSql() +
        "\nORDER BY license"),

    "q201_mixture_plan" ->
      (graft.operators.Selection.mixturePlanSql(MixtureTargets,
        budget = 40000L, maxEpochs = 4) + "\nORDER BY lang"),

    "q202_embedding_qa" ->
      Similarity.embeddingQaSql(expectedDim = Similarity.Dim),

    "q203_char_entropy" ->
      (CorpusStats.charEntropySql(minEntropy = 2.0) + "\nORDER BY doc_id"),

    "q204_stream_chat_intake" ->
      (graft.streaming.ChatIntake.intakeReportSql() +
        "\nORDER BY batch_id, reason"),

    "q205_ann_ndcg" -> s"""$annEvalCtes,
      |dcgs AS (SELECT query_id,
      |    ${graft.engine.Aggregates.sumExactSql("a_cos / ln(rank + 1)")}
      |      AS dcg0 FROM iv GROUP BY query_id),
      |idcgs AS (SELECT query_id,
      |    ${graft.engine.Aggregates.sumExactSql("t_cos / ln(t_rank + 1)")}
      |      AS idcg0 FROM bt GROUP BY query_id)
      |SELECT query_id, round(coalesce(dcg0, 0.0), 6) AS dcg,
      |  round(idcg0, 6) AS idcg,
      |  round(CASE WHEN idcg0 = 0 THEN 0.0
      |    ELSE coalesce(dcg0, 0.0) / idcg0 END, 6) AS ndcg
      |FROM idcgs LEFT JOIN dcgs USING (query_id)
      |ORDER BY query_id""".stripMargin,

    "q206_safety_gate" ->
      (Curation.safetyGateSql() + "\nORDER BY doc_id"),

    "q207_line_df_stored" ->
      (Dedup.dropBoilerplateFromIndexSql(lineLen = 8, plantMod = 2,
        minDf = 5) + "\nORDER BY doc_id"),

    "q208_dataset_card" ->
      (Curation.datasetCardSql() + "\nORDER BY metric"),

    "q209_full_pipeline" ->
      (graft.operators.Pipeline.fullCurationSql() + "\nORDER BY metric"),

    "q210_adaptive_probe" ->
      (Similarity.probeRecallReportSql(k = 50, fixed = Seq(1, 2),
        maxProbe = 4) + "\nORDER BY method"),

    "q211_ivfpq_adaptive" -> Similarity.ivfPqTopKSql(k = 5,
      cellStride = 53, cellIters = 1, nProbe = 3,
      m = 16, subDim = 4, pqStride = 3, pqIters = 1,
      adaptiveProbe = true),

    "q212_maxdf_autotune" ->
      (Dedup.maxDfTuningTableSql(n = 3, pairBudget = 10000000L) +
        "\nORDER BY df"),

    "q213_ivf_fixed_cells" -> s"""WITH ${
        graft.operators.Clustering.kmeansCentsSql(initStride = 1, iters = 2,
          strideSqlOverride = Some(graft.operators.Clustering
            .strideForCellsSql("embeddings", targetCells = 64)))},
      |corpus AS (SELECT vec_id AS neighbor_id, embedding AS c_emb
      |  FROM embeddings),
      |qs AS (SELECT vec_id AS query_id, embedding AS q_emb
      |  FROM embeddings WHERE vec_id < 10),
      |corpus_cells AS (
      |  SELECT neighbor_id, c_emb, cent_id FROM (
      |    SELECT neighbor_id, c_emb, cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY neighbor_id
      |        ORDER BY ${Similarity.Sql.cosine("c_emb", "cent_emb")} DESC,
      |          cent_id) AS r
      |    FROM corpus CROSS JOIN cents) t WHERE r = 1),
      |query_cells AS (
      |  SELECT query_id, q_emb, cent_id FROM (
      |    SELECT query_id, q_emb, cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY query_id
      |        ORDER BY ${Similarity.Sql.cosine("q_emb", "cent_emb")} DESC,
      |          cent_id) AS r
      |    FROM qs CROSS JOIN cents) t WHERE r <= 3),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |    ${Similarity.Sql.cosine("q_emb", "c_emb")} AS cosine
      |  FROM corpus_cells JOIN query_cells USING (cent_id)
      |  WHERE query_id != neighbor_id)
      |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, neighbor_id) AS rank FROM scored) t
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q214_incremental_pipeline" ->
      (graft.operators.Pipeline.incrementalCurationSql() +
        "\nORDER BY metric"),

    "q215_lsh_sizing" ->
      (Dedup.lshSizingTableSql() + "\nORDER BY rows_per_band"),

    // Stored-state twin replays the same ground truth as its inline
    // counterpart (q185): persistence must be bit-invisible.
    "q216_bm25_stored" ->
      (Retrieval.bm25TopKSql(nQueries = 10, k = 5) +
        "\nORDER BY query_id, rank"),

    "q217_simhash_stored" ->
      (Dedup.simhashNearDupAcrossSql(maxHamming = 3, refMod = 3) +
        "\nORDER BY new_id, ref_id"),

    // Version 1 of the minhash fixture = the build-evens state: the
    // truth set is the exhaustive cross-Jaccard against exactly that
    // reference subset.
    "q218_index_time_travel" -> Dedup.trueJaccardAcrossPredSql(
      n = 3, threshold = 0.5,
      refPred = "doc_id % 3 = 0 AND doc_id % 2 = 0",
      newPred = "doc_id % 3 <> 0"),

    // The minhash fixture's commit ledger, re-derived from `documents`:
    // the shingle fallback (< n tokens -> the whole text) means every
    // doc yields >= 1 shingle, so `bands` is exactly 32 rows per doc
    // and `sh` one row per doc; params is one row staged at build and
    // carried (0 new rows) by the append.
    "q219_index_history" ->
      """WITH evens AS (SELECT CAST(count(*) AS BIGINT) AS c
        |    FROM documents WHERE doc_id % 3 = 0 AND doc_id % 2 = 0),
        |  odds AS (SELECT CAST(count(*) AS BIGINT) AS c
        |    FROM documents WHERE doc_id % 3 = 0 AND doc_id % 2 = 1)
        |SELECT CAST(version AS BIGINT) AS version, tag, "table",
        |  CAST(segments AS BIGINT) AS segments,
        |  CAST(new_segments AS BIGINT) AS new_segments,
        |  CAST(new_rows AS BIGINT) AS new_rows
        |FROM (VALUES
        |  (1, 'build', 'bands', 1, 1, (SELECT 32 * c FROM evens)),
        |  (1, 'build', 'params', 1, 1, 1),
        |  (1, 'build', 'sh', 1, 1, (SELECT c FROM evens)),
        |  (2, 'append', 'bands', 2, 1, (SELECT 32 * c FROM odds)),
        |  (2, 'append', 'params', 1, 0, 0),
        |  (2, 'append', 'sh', 2, 1, (SELECT c FROM odds))
        |) AS t(version, tag, "table", segments, new_segments, new_rows)
        |ORDER BY version, "table"""".stripMargin,

    // The pinned daily loop replays against version 1 of the line-df
    // and MinHash stores — the build-evens commits — so the oracle is
    // the q214 chain with the stored-reference predicate narrowed to
    // the evens of the reference slice (the model/tokenizer stores
    // are single-commit: their pinned state IS the live state).
    "q220_pipeline_as_of" ->
      (graft.operators.Pipeline.incrementalCurationSql(
        storedRefPred = "doc_id % 3 = 0 AND doc_id % 2 = 0") +
        "\nORDER BY metric"),

    // After RESTORE to version 1, the live index IS the build-evens
    // state — same truth set as q218's pinned read, reached through
    // the opposite mechanism (a new commit vs a historical pin).
    "q221_index_rollback" -> Dedup.trueJaccardAcrossPredSql(
      n = 3, threshold = 0.5,
      refPred = "doc_id % 3 = 0 AND doc_id % 2 = 0",
      newPred = "doc_id % 3 <> 0"),

    // A faithful clone answers exactly like its source: q148's truth.
    "q222_index_clone" -> Dedup.trueJaccardAcrossSql(3, 0.5, refMod = 3),

    // The partitioned-postings layout is answer-invisible: same truth
    // as the flat store (q216).
    "q223_bm25_partitioned" ->
      (Retrieval.bm25TopKSql(nQueries = 10, k = 5) +
        "\nORDER BY query_id, rank"),

    // Version 1 of the upsert store = the fold of batch 1 alone
    // (event_id <= mid), and within one batch the newest row per key
    // wins — so the pinned read must equal newest-per-key over the
    // lower half. The same `//`-floored midpoint as the Spark split.
    "q224_upsert_time_travel" ->
      """SELECT user_id, event_id, event_type, value
        |FROM (SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY event_id DESC) AS rn
        |  FROM events
        |  WHERE event_id <= (SELECT MIN(event_id) +
        |      (MAX(event_id) - MIN(event_id)) // 2 FROM events)) _
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // The recorded day-1 run pinned v1 of every store — the same
    // state q220 pins by hand, so the same evens-narrowed oracle.
    "q225_run_ledger_replay" ->
      (graft.operators.Pipeline.incrementalCurationSql(
        storedRefPred = "doc_id % 3 = 0 AND doc_id % 2 = 0") +
        "\nORDER BY metric"),

    // The clone fixture's provenance: one commit, cloned from the
    // source's live (build+append) version 2.
    "q226_clone_lineage" ->
      """SELECT CAST(1 AS BIGINT) AS version, 'clone_v2' AS tag,
        |  CAST(2 AS BIGINT) AS src_version""".stripMargin,

    // Same integer arithmetic over the same distinct (doc, term)
    // count: est = rows * 4; buckets = clamp(ceildiv(est, 64 KiB)).
    "q227_bm25_bucket_sizing" ->
      """WITH t AS (SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents) _),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS posting_rows FROM t)
        |SELECT posting_rows,
        |  CAST(posting_rows * 4 AS BIGINT) AS est_bytes,
        |  CAST(65536 AS BIGINT) AS target_bytes,
        |  CAST(GREATEST(1, LEAST(4096,
        |    (posting_rows * 4 + 65535) // 65536)) AS BIGINT) AS buckets
        |FROM c""".stripMargin
  )
}
