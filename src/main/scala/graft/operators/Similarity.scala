package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, as a 100 TB pipeline needs:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline and
  *    the right plan when the query set is small (broadcast queries, one
  *    scan of the corpus, per-partition top-k via window).
  *  - [[ivfTopK]]: IVF-style partitioned ANN — corpus pre-assigned to its
  *    nearest centroid (one-time, columnar); queries probe only the
  *    `nProbe` nearest cells, cutting the scanned fraction to
  *    nProbe/nCells. Centroid assignment is itself a broadcast
  *    cross-product (centroids are tiny), so nothing is ever pairwise over
  *    the corpus.
  *
  * Cosine is computed with `zip_with`+`aggregate` (codegen'd, strict
  * left-to-right summation) so results are deterministic and reproducible
  * by the oracle's `list_reduce` construction.
  */
object Similarity {

  /** Strict left-to-right dot product of two float vectors in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; zero vectors → 0.0 (guarded, ANSI-safe). */
  def cosine(a: Column, b: Column): Column = {
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot(a, b) / na / nb)
  }

  /** SQL twin (DuckDB): identical association order —
    * `((0 + x1) + x2) + ...`, then `dot / sqrt(na) / sqrt(nb)`. */
  object Sql {
    def dot(a: String, b: String): String =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(range(1, 65), k -> " +
        s"CAST($a[k] AS DOUBLE) * CAST($b[k] AS DOUBLE))), (x, y) -> x + y)"

    def cosine(a: String, b: String): String =
      s"CASE WHEN sqrt(${dot(a, a)}) = 0.0 OR sqrt(${dot(b, b)}) = 0.0 " +
        s"THEN 0.0 ELSE ${dot(a, b)} / sqrt(${dot(a, a)}) / sqrt(${dot(b, b)}) END"
  }

  /** Exact cosine top-k: broadcast the (small) query set against the
    * corpus, one corpus scan, window top-k. Ties broken by corpus id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup). Brute force
    * here; the LSH/banding path in [[graft.operators.Dedup]] is the scale
    * analog. Corpus side must be small enough to broadcast one side — for
    * larger corpora use [[ivfTopK]]-style cell-bucketed self-join. */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("e_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("e_a"), col("e_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** IVF-style ANN: deterministic centroids (every `centroidStride`-th
    * vector), corpus assigned to nearest centroid once, queries probe the
    * `nProbe` nearest cells only. Returns the same schema as
    * [[bruteForceTopK]]; recall measured in tests. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      centroidStride: Int = 53, nProbe: Int = 3): DataFrame = {
    val cents = corpus.filter(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))

    def assign(df: DataFrame, idC: String, embC: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(idC)
        .orderBy(col("sim").desc, col("cent_id"))
      df.join(broadcast(cents), lit(true))
        .withColumn("sim", cosine(col(embC), col("cent_emb")))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= keep)
        .drop("sim", "r", "cent_emb")
    }

    val corpusCells = assign(
      corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb")),
      "neighbor_id", "c_emb", 1)
    val queryCells = assign(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
      "query_id", "q_emb", nProbe)

    val scored = corpusCells.join(queryCells, Seq("cent_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
