package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Aggregates

/** Hybrid retrieval: an exact lexical ranking (TF-IDF query-by-example)
  * and an exact vector ranking (cosine top-k) fused with Reciprocal
  * Rank Fusion — `score(d) = Σ_lists 1/(c + rank_list(d))` (Cormack,
  * Clarke & Buettcher, SIGIR 2009, the standard c = 60). RRF is the
  * fusion every hybrid search stack ships because it needs no score
  * calibration between lists: only RANKS cross the fusion boundary,
  * which also makes the whole operator hash-gate deterministic — the
  * only floats compared downstream are `1/(c+rank)` sums of two terms
  * in a fixed order.
  *
  * Scale shape: the query set is tiny and BROADCAST to both legs. The
  * lexical leg joins the corpus term-frequency table against the
  * broadcast query vocabulary on the term — the corpus is never
  * shuffled by term; only the (query, candidate) partial scores move.
  * The vector leg is the one-scan broadcast cosine ranking
  * ([[Similarity.bruteForceTopK]]; swap in the IVF/PQ path at larger
  * query counts). Both legs cut to `listK` before the fusion join, so
  * the full-outer fusion touches ≤ 2·nQueries·listK rows regardless of
  * corpus size. */
object Retrieval {

  /** Per-(doc, term) frequencies of `docs(idCol, textCol)` — whitespace
    * tokens, the corpus-wide statistic lexical scoring, IDF, and the
    * DSIR class counts all derive from (shared with
    * [[Selection.dsirLogWeights]] so the tokenization can never
    * diverge between the paths). `carryCols` ride along per doc
    * (constant within a doc, carried by `first`). */
  private[operators] def termFreq(docs: DataFrame, idCol: String,
      textCol: String, carryCols: Seq[String] = Nil): DataFrame =
    docs.select(col(idCol) +: carryCols.map(col) :+
        explode(split(col(textCol), " ")).as("w"): _*)
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("tf"),
        carryCols.map(c => first(col(c)).as(c)): _*)

  /** Hybrid RRF top-k: query docs are `idCol < nQueries` (their ids
    * double as embedding ids). Emits one row per kept (query,
    * candidate) with both leg ranks (null = absent from that leg's
    * top-`listK`), the fused score, and the fused rank ≤ `k`. */
  def hybridRrfTopK(docs: DataFrame, emb: DataFrame, nQueries: Int = 10,
      listK: Int = 20, k: Int = 5, c: Int = 60): DataFrame = {
    // --- vector leg: exact cosine top-listK, ranks only.
    val vec = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < nQueries), emb, listK)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("v_rank"))

    // --- lexical leg: score(q, d) = Σ_{w ∈ q} tf(w, d) · ln(N/df(w)),
    // distinct query terms, self-match excluded like the vector leg.
    // Exact decimal summation so the per-query ranking is reduce-order
    // independent (and ulp-identical to the SQL twin). The tf table has
    // three consumers (document frequencies, query vocabulary, scoring
    // join) — materialized so the corpus tokenizes once.
    val tf = graft.engine.Caches.materialized(
      termFreq(docs, "doc_id", "text"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("_n"))
    val qterms = tf.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("w")).distinct()
    val lex = tf
      .join(broadcast(qterms), "w")
      .filter(col("doc_id") =!= col("query_id"))
      .join(dfreq, "w")
      .crossJoin(broadcast(n))
      .groupBy("query_id", "doc_id")
      .agg(Aggregates.sumExact(
        col("tf") * log(col("_n").cast("double") / col("df"))).as("lex"))
    val lw = Window.partitionBy("query_id")
      .orderBy(col("lex").desc, col("doc_id").asc)
    val lexTop = lex.withColumn("l_rank", row_number().over(lw))
      .filter(col("l_rank") <= listK)
      .select(col("query_id"), col("doc_id").as("neighbor_id"), col("l_rank"))

    // --- fusion: full outer on (query, candidate); fixed add order.
    val fused = vec.join(lexTop, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c) + col("v_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("l_rank")), lit(0.0)))
    val fw = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("neighbor_id").asc)
    fused.withColumn("rank", row_number().over(fw))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "v_rank", "l_rank", "rrf", "rank")
  }

  /** Hard-negative mining for embedding-model training: for each query
    * vector, the `k` most-cosine-similar vectors whose LABEL differs
    * from the query's — the near-miss impostors a contrastive trainer
    * wants as negatives (easy random negatives teach nothing). Same
    * broadcast one-corpus-scan shape as [[Similarity.bruteForceTopK]],
    * with the label inequality folded into the join condition so
    * same-label rows drop before scoring; swap the IVF/PQ candidate
    * path in at larger query counts exactly as for plain ANN. */
  def hardNegatives(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"),
        Similarity.norm(col("embedding")).as("q_nrm"))
    val c = emb.select(col("vec_id").as("neighbor_id"),
      col("label").as("n_label"), col("embedding").as("c_emb"),
      Similarity.norm(col("embedding")).as("c_nrm"))
    val scored = c.join(broadcast(q), col("n_label") =!= col("q_label"))
      .withColumn("cosine", Similarity.cosineWithNorms(col("q_emb"),
        col("c_emb"), col("q_nrm"), col("c_nrm")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "q_label", "neighbor_id", "n_label", "cosine", "rank")
  }

  /** SQL twin of [[hardNegatives]] (`embeddings` hard-wired). */
  def hardNegativesSql(nQueries: Int = 10, k: Int = 5): String =
    s"""WITH q AS (SELECT vec_id AS query_id, label AS q_label,
       |    embedding AS q_emb FROM embeddings WHERE vec_id < $nQueries),
       |scored AS (SELECT query_id, q_label, vec_id AS neighbor_id,
       |    label AS n_label,
       |    ${Similarity.Sql.cosine("q_emb", "embedding")} AS cosine
       |  FROM embeddings JOIN q ON label != q_label)
       |SELECT query_id, q_label, neighbor_id, n_label, cosine,
       |  CAST(rank AS INTEGER) AS rank
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS rank FROM scored) _
       |WHERE rank <= $k""".stripMargin

  /** SQL twin of [[hybridRrfTopK]] (`documents`/`embeddings`
    * hard-wired; same decimal-exact lexical sum, same fixed-order RRF
    * arithmetic, ranks cast to INTEGER to match Spark's row_number). */
  def hybridRrfTopKSql(nQueries: Int = 10, listK: Int = 20, k: Int = 5,
      c: Int = 60): String =
    s"""WITH vq AS (SELECT vec_id AS query_id, embedding AS q_emb
       |    FROM embeddings WHERE vec_id < $nQueries),
       |vscored AS (SELECT query_id, vec_id AS neighbor_id,
       |    ${Similarity.Sql.cosine("q_emb", "embedding")} AS cosine
       |  FROM embeddings JOIN vq ON vec_id != query_id),
       |vtop AS (SELECT query_id, neighbor_id, CAST(v_rank AS INTEGER) AS v_rank
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS v_rank FROM vscored) _
       |  WHERE v_rank <= $listK),
       |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM t GROUP BY 1, 2),
       |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS _n FROM documents),
       |qt AS (SELECT DISTINCT doc_id AS query_id, w FROM tf
       |  WHERE doc_id < $nQueries),
       |lex AS (SELECT qt.query_id, tf.doc_id,
       |    ${Aggregates.sumExactSql(s"tf.tf * ln(CAST(_n AS DOUBLE) / df)")} AS lex
       |  FROM tf JOIN qt USING (w) JOIN dfreq USING (w), n
       |  WHERE tf.doc_id != qt.query_id
       |  GROUP BY 1, 2),
       |ltop AS (SELECT query_id, neighbor_id, CAST(l_rank AS INTEGER) AS l_rank
       |  FROM (SELECT query_id, doc_id AS neighbor_id, ROW_NUMBER() OVER
       |      (PARTITION BY query_id ORDER BY lex DESC, doc_id ASC) AS l_rank
       |    FROM lex) _
       |  WHERE l_rank <= $listK),
       |fused AS (SELECT
       |    COALESCE(v.query_id, l.query_id) AS query_id,
       |    COALESCE(v.neighbor_id, l.neighbor_id) AS neighbor_id,
       |    v.v_rank, l.l_rank,
       |    COALESCE(1.0 / ($c + v.v_rank), 0.0) +
       |      COALESCE(1.0 / ($c + l.l_rank), 0.0) AS rrf
       |  FROM vtop v FULL JOIN ltop l
       |    ON v.query_id = l.query_id AND v.neighbor_id = l.neighbor_id)
       |SELECT query_id, neighbor_id, v_rank, l_rank, rrf,
       |  CAST(rank AS INTEGER) AS rank
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY rrf DESC, neighbor_id ASC) AS rank FROM fused) _
       |WHERE rank <= $k""".stripMargin

  /** BM25 top-k (Robertson & Zaragoza, FnTIR 2009 — the Okapi scoring
    * every production lexical search engine ships): for each query
    * document (`idCol < nQueries`, query-by-example like the RRF legs),
    * rank candidates by
    * `Σ_{w ∈ q} idf(w) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))`
    * with the standard plus-one idf `ln((N−df+0.5)/(df+0.5) + 1)`. The
    * TF-IDF leg in [[hybridRrfTopK]] has no length normalization — a
    * long spammy document accumulates score linearly in its repeats;
    * BM25's tf saturation (k1) and length prior (b) are exactly the two
    * corrections the production ranker carries.
    *
    * Determinism contract: per-term scores are one fixed-order double
    * expression (mirrored token-for-token in [[bm25TopKSql]]), the
    * per-(query, candidate) reduction is the exact-decimal sum, ranks
    * break ties on candidate id. Scale shape: same as the lexical RRF
    * leg — the corpus term-frequency table is built once (never
    * shuffled by term), query vocabulary broadcast, only (query,
    * candidate) partials move; doc lengths ride the same tf table. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      nQueries: Int = 10, k: Int = 5, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val tf = graft.engine.Caches.materialized(
      termFreq(docs, idCol, textCol))
    val dl = tf.groupBy(col(idCol)).agg(sum("tf").as("dl"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("_n"))
      .crossJoin(dl.agg(Aggregates.sumExact(col("dl").cast("double"))
        .as("_dlsum")))
      .withColumn("avgdl", col("_dlsum") / col("_n"))
    val qterms = tf.filter(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col("w")).distinct()
    val scored = tf
      .join(broadcast(qterms), "w")
      .filter(col(idCol) =!= col("query_id"))
      .join(dfreq, "w")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(
        (col("_n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)))
      .withColumn("term_score",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            (lit(b) * col("dl").cast("double")) / col("avgdl"))))
      .groupBy(col("query_id"), col(idCol).as("neighbor_id"))
      .agg(Aggregates.sumExact(col("term_score")).as("bm25"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("bm25").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "bm25", "rank")
  }

  /** SQL twin of [[bm25TopK]] (`documents` hard-wired; identical
    * fixed-order per-term expression, same decimal-exact reduction). */
  def bm25TopKSql(nQueries: Int = 10, k: Int = 5, k1: Double = 1.2,
      b: Double = 0.75): String =
    s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM t GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf
       |  GROUP BY 1),
       |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
       |stats AS (SELECT (SELECT count(*) FROM documents) AS _n,
       |  (SELECT ${Aggregates.sumExactSql("CAST(dl AS DOUBLE)")} FROM dl)
       |    AS _dlsum),
       |s2 AS (SELECT _n, _dlsum / _n AS avgdl FROM stats),
       |qt AS (SELECT DISTINCT doc_id AS query_id, w FROM tf
       |  WHERE doc_id < $nQueries),
       |scored AS (SELECT qt.query_id, tf.doc_id AS neighbor_id,
       |    ${Aggregates.sumExactSql(
             s"ln((_n - df + 0.5) / (df + 0.5) + 1.0) * " +
               s"(tf.tf * ${k1 + 1.0}) / (tf.tf + $k1 * " +
               s"((${1.0 - b}) + ($b * CAST(dl.dl AS DOUBLE)) / avgdl))")}
       |      AS bm25
       |  FROM tf JOIN qt USING (w) JOIN dfreq USING (w)
       |    JOIN dl ON dl.doc_id = tf.doc_id, s2
       |  WHERE tf.doc_id != qt.query_id
       |  GROUP BY 1, 2)
       |SELECT query_id, neighbor_id, bm25, CAST(rank AS INTEGER) AS rank
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY bm25 DESC, neighbor_id ASC) AS rank FROM scored) _
       |WHERE rank <= $k""".stripMargin
}
