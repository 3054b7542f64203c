package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training-data
  * pipelines.
  *
  * `df.sample()`/`rand()` are the wrong tool for corpus curation: the
  * sample changes with partitioning, retries, and cluster size, and two
  * copies of the same document can land in different splits (train/test
  * leakage). Content-keyed hash bucketing fixes all of it: the bucket is
  * a pure function of the document text, so assignment is reproducible
  * run-to-run and engine-to-engine, survives repartitioning and
  * speculative execution, and identical texts land in identical splits
  * by construction.
  *
  * The hash is the first 8 MD5 bytes little-endian (the same value as
  * DuckDB's `md5_number_upper` and [[graft.functions.TextKernels.md5First8LE]]),
  * composed from codegen'd built-ins. Buckets are a power of two taken
  * with a bitwise AND — low bits are identical under signed (Spark long)
  * and unsigned (DuckDB UBIGINT) interpretations, which a modulo is not.
  */
object Sampling {

  /** 64-bit content fingerprint as a signed long: first 8 MD5 bytes
    * little-endian, built from `md5`/`substring`/`conv` built-ins (all
    * codegen'd; `conv(_, 16, -10)` yields the signed interpretation). */
  def contentHash64(c: Column): Column = {
    val hexLE = concat((0 until 8).reverse.map(i =>
      substring(md5(c.cast("binary")), 2 * i + 1, 2)): _*)
    conv(hexLE, 16, -10).cast("long")
  }

  /** Deterministic bucket in `[0, nBuckets)`; `nBuckets` must be a power
    * of two so the result is sign-interpretation-proof (see class doc). */
  def bucket(c: Column, nBuckets: Int): Column = {
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two, got $nBuckets")
    contentHash64(c).bitwiseAND(lit((nBuckets - 1).toLong))
  }

  /** Content-keyed train/val/test assignment: adds `bucket` and `split`
    * columns. Thresholds are bucket counts out of `nBuckets` (e.g. 819,
    * 922 of 1024 ≈ 80/10/10). Assignment granularity is 1/nBuckets. */
  def assignSplits(df: DataFrame, textCol: String, trainBuckets: Int = 819,
      valBuckets: Int = 922, nBuckets: Int = 1024): DataFrame = {
    require(0 <= trainBuckets && trainBuckets <= valBuckets &&
      valBuckets <= nBuckets,
      s"need 0 <= train <= val <= nBuckets, got $trainBuckets/$valBuckets/$nBuckets")
    val b = bucket(col(textCol), nBuckets)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainBuckets, "train")
          .when(col("bucket") < valBuckets, "val")
          .otherwise("test"))
  }

  /** Cluster-aware leakage-safe split assignment: every member of a
    * near-dup cluster is assigned the split of its cluster
    * REPRESENTATIVE (the min-id label from [[Dedup.dedupClusters]]),
    * so near-duplicates can never straddle train/test — the failure
    * mode [[assignSplits]] alone cannot prevent (content hashing pins
    * only IDENTICAL text to one side; a near-dup with one word changed
    * hashes anywhere, and a test document whose near-twin sits in
    * train is leaked evaluation). Singletons (absent from `clusters`)
    * are their own representative, so the output covers every input
    * document and degrades to exactly [[assignSplits]] semantics on a
    * dedup-clean corpus.
    *
    * Scale shape: representative splits are a map-only projection over
    * one corpus scan (same hash as [[assignSplits]]); the member
    * attach is two equi-joins on id / cluster_id (the clusters frame
    * holds only near-dup members — tiny next to the corpus — and AQE
    * broadcasts it when it fits). Determinism is inherited: the split
    * is a pure function of the representative's text. */
  def clusterSafeSplits(docs: DataFrame, idCol: String, textCol: String,
      clusters: DataFrame, trainBuckets: Int = 819, valBuckets: Int = 922,
      nBuckets: Int = 1024): DataFrame = {
    val withRep = docs.select(col(idCol))
      .join(clusters.select(col("id").as(idCol), col("cluster_id")),
        Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
    val repSplits = assignSplits(
        docs.select(col(idCol).as("cluster_id"), col(textCol).as("rep_text")),
        "rep_text", trainBuckets, valBuckets, nBuckets)
      .select(col("cluster_id"), col("bucket"), col("split"))
    withRep.join(repSplits, Seq("cluster_id"))
      .select(idCol, "cluster_id", "bucket", "split")
  }

  /** Deterministic ≈`keepBuckets/nBuckets` sample: keeps exactly the rows
    * whose content bucket falls below the cut — the reproducible
    * downsampling step of a corpus pipeline (same text kept or dropped
    * identically everywhere, at any scale, forever). */
  def sampleByContent(df: DataFrame, textCol: String, keepBuckets: Int,
      nBuckets: Int = 1024): DataFrame =
    df.filter(bucket(col(textCol), nBuckets) < keepBuckets)

  /** Approximate group counts from the deterministic content sample —
    * approximate query processing with EXACT replayability: the sample
    * is a pure function of the key ([[bucket]] < keepBuckets), so the
    * "approximate" answer is itself deterministic across runs, engines
    * and cluster sizes — an estimate you can regression-test, unlike
    * `TABLESAMPLE`. The scan reads keepBuckets/nBuckets of the data
    * (with the bucket filter evaluated on the codegen'd hash, rows drop
    * before the agg exchange) and the estimate is the exact integer
    * scale-up `n_sampled · (nBuckets / keepBuckets)`. */
  def approxGroupCount(df: DataFrame, sampleKey: Column,
      groupCols: Seq[Column], keepBuckets: Int,
      nBuckets: Int = 1024): DataFrame = {
    require(keepBuckets > 0 && nBuckets % keepBuckets == 0,
      s"nBuckets ($nBuckets) must be a multiple of keepBuckets ($keepBuckets)")
    val scale = nBuckets / keepBuckets
    df.filter(bucket(sampleKey, nBuckets) < keepBuckets)
      .groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n_sampled"))
      .withColumn("n_est", col("n_sampled") * lit(scale.toLong))
  }

  /** SQL twin (DuckDB): `md5_number_upper` is bit-identical to
    * [[contentHash64]]; `& (nBuckets-1)` matches on the low bits
    * regardless of signedness. */
  def bucketSql(x: String, nBuckets: Int): String =
    s"(md5_number_upper($x) & ${nBuckets - 1})"

  def assignSplitsSql(textCol: String, trainBuckets: Int = 819,
      valBuckets: Int = 922, nBuckets: Int = 1024): String =
    s"""CAST(${bucketSql(textCol, nBuckets)} AS BIGINT) AS bucket,
       |  CASE WHEN ${bucketSql(textCol, nBuckets)} < $trainBuckets THEN 'train'
       |       WHEN ${bucketSql(textCol, nBuckets)} < $valBuckets THEN 'val'
       |       ELSE 'test' END AS split""".stripMargin

  /** Exact-quota stratified sample: keep (up to) `quota` rows per
    * stratum — the class-balancing step of a corpus pipeline, where
    * fractional sampling over-represents big strata. Selection order is
    * the MD5 HEX STRING of the text (ties broken by the text itself):
    * hex strings order identically everywhere, where the numeric hash
    * would order signed in Spark (long) but unsigned in DuckDB
    * (UBIGINT). Reproducible and leakage-proof like [[sampleByContent]],
    * but with an exact per-stratum count; the rank window partitions by
    * stratum — per-stratum sorts, never a global one. */
  def quotaSample(df: DataFrame, stratumCol: String, textCol: String,
      quota: Int): DataFrame = {
    require(quota > 0, s"quota must be > 0, got $quota")
    val w = Window.partitionBy(stratumCol)
      .orderBy(md5(col(textCol).cast("binary")).asc, col(textCol).asc)
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= quota).drop("_rk")
  }

  /** Keep the TOP `q` fraction of each stratum by score — the
    * FineWeb-style "keep the best X% per language by classifier
    * score" cut ([[quotaSample]] balances COUNTS; this keeps the
    * best-scoring tail). Deterministic: ties break on `idCol`, and the
    * kept count per stratum is `ceil(q * n)` (at least one row per
    * non-empty stratum for any q > 0). Scale shape: the rank and count
    * windows are PARTITIONED by the stratum — per-stratum sorts, never
    * a global one (the quotaSample argument; a global top-quantile
    * would funnel the corpus through one reducer, the thing a
    * production cut replaces with an approx-quantile threshold). */
  def topQuantileByScore(df: DataFrame, stratumCol: String,
      scoreCol: String, idCol: String, q: Double): DataFrame = {
    require(q > 0 && q <= 1, s"quantile must be in (0, 1], got $q")
    val rankW = Window.partitionBy(stratumCol)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val countW = Window.partitionBy(stratumCol)
    df.withColumn("_rk", row_number().over(rankW))
      .withColumn("_n", count(lit(1)).over(countW))
      .where(col("_rk") <= ceil(lit(q) * col("_n")))
      .drop("_rk", "_n")
  }

  /** SQL twin of [[topQuantileByScore]]: wrap as a subquery computing
    * both windows, filter outside. */
  def topQuantileRankSql(stratumCol: String, scoreCol: String,
      idCol: String): (String, String) = (
    s"""row_number() OVER (PARTITION BY $stratumCol
       |    ORDER BY $scoreCol DESC, $idCol ASC)""".stripMargin,
    s"COUNT(*) OVER (PARTITION BY $stratumCol)")

  /** SQL twin of [[quotaSample]]'s rank (DuckDB `md5` = the same
    * lowercase hex). Wrap as an rn subquery with `rn <= quota`. */
  def quotaRankSql(stratumCol: String, textCol: String): String =
    s"""row_number() OVER (PARTITION BY $stratumCol
       |    ORDER BY md5($textCol) ASC, $textCol ASC)"""
      .stripMargin

  /** Temperature-scaled language-mixture sampling — the Pile/LLaMA-style
    * reweighting a pretraining pipeline applies before batching: each
    * language's token budget is proportional to `T_lang^(1/temperature)`
    * (temperature > 1 upsamples the tail languages relative to raw
    * frequency; 1.0 reproduces it; the default 2.0 is the classic
    * sqrt-mix), then the best-quality-first documents of each language
    * fill its budget.
    *
    * Scale shape: the per-language totals and weights are a language-
    * cardinality aggregate (broadcast back). The per-language quality
    * cut does NOT use a window partitioned by language — a real corpus
    * is dominated by one language, so that window would sort most of
    * the corpus on a single reducer. It is the same two-pass
    * distributed prefix sum as the token-budget sampler, with the
    * language prepended to the range key: range-partition on
    * (lang, quality desc, id), per-(lang, partition) local running
    * sums, then the (languages × partitions)-row offset table —
    * metadata-scale — broadcast back. Bit-identical to the global
    * per-language window because each (lang, partition) segment is a
    * contiguous slice of its language's global order.
    *
    * Determinism: temperature 2.0 uses `sqrt`, which IEEE 754 requires
    * correctly rounded — bit-identical across engines; other
    * temperatures go through `pow`, which libm does NOT guarantee (the
    * oracle gate pins the sqrt mix; other temperatures are spec-tested
    * in-engine only). The weight normalizer is an exact decimal sum of
    * the (few) per-language weights, so summation order cannot perturb
    * the budgets. */
  def temperatureMixSample(docs: DataFrame, idCol: String, textCol: String,
      totalTokens: Long, temperature: Double = 2.0): DataFrame = {
    import graft.engine.Aggregates
    import graft.functions.TextFunctions
    require(totalTokens > 0, s"totalTokens must be > 0, got $totalTokens")
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    val base = docs.select(col(idCol),
      TextFunctions.langId(col(textCol)).as("lang"),
      TextFunctions.qualityScore(col(textCol)).as("quality"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val wRaw =
      if (temperature == 2.0) sqrt(col("t_l").cast("double"))
      else pow(col("t_l").cast("double"), lit(1.0 / temperature))
    val weights = base.groupBy("lang")
      .agg(sum("n_tokens").as("t_l"))
      .withColumn("w_raw", wRaw)
    val wSum = weights.agg(Aggregates.sumExact(col("w_raw")).as("w_sum"))
    val budgets = weights.crossJoin(broadcast(wSum))
      .select(col("lang"),
        (col("w_raw") / col("w_sum") * totalTokens).as("budget"))
    val p = docs.sparkSession.sparkContext.defaultParallelism
    val local = graft.engine.Caches.materialized(base
      .repartitionByRange(p, col("lang"), col("quality").desc, col(idCol).asc)
      .withColumn("pid", spark_partition_id())
      .withColumn("local_cum", sum("n_tokens").over(
        Window.partitionBy("lang", "pid")
          .orderBy(col("quality").desc, col(idCol).asc))))
    val totals = local.groupBy("lang", "pid").agg(max("local_cum").as("ptotal"))
    val offsets = totals.withColumn("offset",
      coalesce(sum("ptotal").over(
        Window.partitionBy("lang").orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("lang", "pid", "offset")
    local.join(broadcast(offsets), Seq("lang", "pid"))
      .withColumn("cum", col("local_cum") + col("offset"))
      .join(broadcast(budgets), Seq("lang"))
      .filter(col("cum").cast("double") <= col("budget"))
      .select(col(idCol), col("lang"), col("n_tokens"), col("cum"))
  }

  /** Oracle twin of [[temperatureMixSample]] at temperature 2.0
    * (`documents` hard-wired; sqrt is IEEE-exact, see the operator). */
  def temperatureMixSampleSql(totalTokens: Long): String = {
    import graft.engine.Aggregates
    import graft.functions.TextFunctions.{Sql => T}
    s"""WITH base AS (SELECT doc_id, ${T.langId("text")} AS lang,
       |    ${T.qualityScore("text")} AS quality,
       |    CAST(${T.tokenCount("text")} AS BIGINT) AS n_tokens
       |  FROM documents),
       |w AS (SELECT lang, sqrt(CAST(SUM(n_tokens) AS DOUBLE)) AS w_raw
       |  FROM base GROUP BY lang),
       |ws AS (SELECT ${Aggregates.sumExactSql("w_raw")} AS w_sum FROM w),
       |b AS (SELECT lang, w_raw / w_sum * $totalTokens AS budget
       |  FROM w CROSS JOIN ws),
       |c AS (SELECT base.*, CAST(SUM(n_tokens) OVER (PARTITION BY lang
       |    ORDER BY quality DESC, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM base)
       |SELECT c.doc_id, c.lang, c.n_tokens, c.cum
       |FROM c JOIN b USING (lang)
       |WHERE CAST(cum AS DOUBLE) <= budget
       |ORDER BY doc_id""".stripMargin
  }

  /** SOFT dedup — duplicate-aware TRAINING WEIGHTS instead of removal
    * (He et al., "SoftDedup: an Efficient Data Reweighting Method for
    * Speeding Up Language Model Pre-training", ACL 2024): hard near-dup
    * removal (q38's survivors) throws away the signal that a document
    * was independently published N times; soft dedup KEEPS every copy
    * and down-weights it by its commonness, so the sampled gradient
    * mass per piece of content is constant. Commonness here is the
    * near-dup CLUSTER SIZE ([[Dedup.dedupClusters]] over `pairs`);
    * weight = 1/commonness, singletons (docs in no cluster) weigh 1.
    * Emits `(id, commonness, weight)` for EVERY document — the sampler
    * multiplies these into its per-doc sampling rate.
    *
    * Scale shape: inherits the O(log diameter) pointer-doubling rounds
    * of [[Dedup.dedupClusters]]; on top of that, one cluster-keyed
    * count (cluster-cardinality output) joined back to members, then a
    * LEFT join to the corpus on the id key — all shuffles are on id/
    * cluster keys, nothing driver-side, no new scan of the text. */
  def softDedupWeights(docs: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame = {
    val clusters = Dedup.dedupClusters(pairs)
    val sizes = clusters.groupBy("cluster_id")
      .agg(count(lit(1)).as("commonness"))
    val members = clusters.join(sizes, Seq("cluster_id"))
      .select(col("id").as(idCol), col("commonness"))
    docs.select(col(idCol))
      .join(members, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("commonness"), lit(1L)).as("commonness"),
        round(lit(1.0) / coalesce(col("commonness"), lit(1L)).cast("double"),
          6).as("weight"))
  }

  /** EFFECTIVE corpus size under soft-dedup weights — the headline
    * number the SoftDedup reweighting exists to control: per language,
    * raw doc/token volume next to the weight-discounted volume
    * (`Σ weight`, `Σ weight·tokens`). The gap between raw and effective
    * is exactly the redundancy the corpus carries; a language whose
    * effective share collapses is one whose crawl is mostly
    * republication — the per-language budget input for a q99-style
    * temperature mix over DEDUPLICATED mass instead of raw mass.
    *
    * Scale shape: [[softDedupWeights]]'s cluster build + one id-keyed
    * join carrying (lang, token count) + a language-cardinality
    * aggregation; exact-decimal sums for the weighted columns. */
  def effectiveCorpusSize(docs: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, langCol: String): DataFrame = {
    import graft.engine.Aggregates
    import graft.functions.TextFunctions
    val weights = softDedupWeights(docs, pairs, idCol)
    docs.select(col(idCol), col(langCol).as("lang"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .join(weights, Seq(idCol))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        Aggregates.sumExact(col("weight")).as("effective_docs"),
        Aggregates.sumExact(col("weight") * col("n_tokens").cast("double"))
          .as("effective_tokens"))
  }

  /** Oracle twin of [[effectiveCorpusSize]] (wraps
    * [[softDedupWeightsSql]]'s chain; `documents` hard-wired). */
  def effectiveCorpusSizeSql(n: Int = 3, threshold: Double = 0.5): String = {
    import graft.engine.Aggregates
    import graft.functions.TextFunctions.{Sql => T}
    s"""WITH RECURSIVE w AS (
       |${softDedupWeightsSql(n, threshold)}
       |), base AS (SELECT doc_id, lang,
       |    CAST(${T.tokenCount("text")} AS BIGINT) AS n_tokens
       |  FROM documents)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  ${Aggregates.sumExactSql("weight")} AS effective_docs,
       |  ${Aggregates.sumExactSql(
           "weight * CAST(n_tokens AS DOUBLE)")} AS effective_tokens
       |FROM base JOIN w USING (doc_id)
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Oracle twin of [[softDedupWeights]] over `documents` with the
    * exhaustive true-Jaccard pair source (= the LSH pipeline's output
    * on the planted corpus — the q24/q37 recall argument) and the
    * recursive-CTE connected components the q37 oracle uses. */
  def softDedupWeightsSql(n: Int = 3, threshold: Double = 0.5): String =
    s"""WITH RECURSIVE pairs AS (
       |${Dedup.trueJaccardPairsSql(n, threshold)}
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs
       |), reach AS (
       |  SELECT DISTINCT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT e.src AS id, reach.r FROM reach JOIN edges e ON e.dst = reach.id
       |), clusters AS (
       |  SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
       |), sizes AS (
       |  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS commonness
       |  FROM clusters GROUP BY cluster_id
       |), members AS (
       |  SELECT c.id, s.commonness FROM clusters c JOIN sizes s
       |  USING (cluster_id)
       |)
       |SELECT d.doc_id,
       |  CAST(COALESCE(m.commonness, 1) AS BIGINT) AS commonness,
       |  round(CAST(1.0 AS DOUBLE) /
       |    CAST(COALESCE(m.commonness, 1) AS DOUBLE), 6) AS weight
       |FROM documents d LEFT JOIN members m ON m.id = d.doc_id
       |ORDER BY doc_id""".stripMargin
}
