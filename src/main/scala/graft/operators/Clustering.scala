package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic clustering for the embedding tier — the centroid
  * trainer behind IVF ANN (q28).
  *
  * [[kmeansCentroids]] is Lloyd's algorithm made REPLAYABLE: every
  * choice that is conventionally random or order-dependent is pinned
  * down so that an external engine (the DuckDB oracle) can re-run
  * training from the same inputs and land on bit-identical centroids:
  *
  *  - init: the vectors whose id ≡ 0 (mod `initStride`) — a data
  *    property, not a seeded sample, so SQL replays it with a WHERE;
  *  - assignment: argmax cosine with ties to the LOWEST centroid id
  *    (cosine is the engine's strict left-to-right kernel, so both
  *    engines compute the same double);
  *  - update: per-dimension mean as an exact DECIMAL(28,12) sum (order
  *    insensitive — a plain double sum varies run to run with partition
  *    merge order) divided by the count, then cast to FLOAT — each
  *    round ends on a canonical float32 grid both engines agree on;
  *  - empty clusters keep their previous centroid (never dropped, so
  *    the centroid-id set is stable across rounds);
  *  - a FIXED iteration count — no data-dependent stopping rule to
  *    replay.
  *
  * Scale shape: each round is one broadcast of the (small by
  * definition) centroid set against a single corpus scan, a map-side
  * `max_by` assignment aggregation, and a partial/final per-dimension
  * mean — no window, no shuffle of the corpus beyond the aggregation
  * exchange (which partial agg collapses to ≤ k·dim rows per
  * partition). The driver materializes exactly the k·dim centroid
  * floats per round (the same bounded-metadata class as the
  * connected-components convergence counter); the loop plan is O(1) in
  * the round count because each round restarts from collected centroid
  * literals rather than growing lineage. */
object Clustering {

  /** Max L∞ centroid movement of the LAST [[kmeansCentroids]] round —
    * convergence diagnostic for specs (meaningless under concurrent
    * callers). */
  @volatile private[graft] var lastMaxShift: Double = Double.NaN

  /** Train and return the centroid table `(cent_id, cent_emb)`;
    * `cent_id` is the seed vector's id (stable label). */
  def kmeansCentroids(corpus: DataFrame, idCol: String, embCol: String,
      initStride: Long, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    require(initStride >= 1, s"initStride must be >= 1, got $initStride")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // One corpus scan for the whole training loop: init + every Lloyd
    // round re-reads the projected corpus, so at scale an unpersisted
    // input is iters+1 full parquet scans. Trainer-local persist with an
    // eager count barrier (lazy persist races AQE stage threads into
    // duplicated computation), released before returning.
    val proj = corpus.select(col(idCol).cast("long").as("_id"),
      col(embCol).as("_e")).persist()
    proj.count()
    try {
    var cents: Seq[(Long, Seq[Float])] = proj
      .filter(col("_id") % initStride === 0)
      .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1)
    require(cents.nonEmpty, "initStride selected no init centroids")
    for (_ <- 1 to iters) {
      val centsDf = cents.toDF("cent_id", "cent_emb")
      val assigned = proj
        .join(broadcast(centsDf), lit(true))
        .withColumn("_sim", Similarity.cosine(col("_e"), col("cent_emb")))
        .groupBy("_id").agg(first(col("_e")).as("_e"),
          max_by(col("cent_id"), struct(col("_sim"), -col("cent_id")))
            .as("_cid"))
      val means = assigned
        .select(col("_cid"), posexplode(col("_e")).as(Seq("_d", "_v")))
        .groupBy("_cid", "_d")
        .agg((sum(col("_v").cast("double").cast(DecimalType(28, 12)))
          .cast("double") / count(lit(1))).as("_m"))
        .groupBy("_cid")
        .agg(array_sort(collect_list(struct(col("_d"), col("_m")))).as("_dm"))
        .select(col("_cid").as("cent_id"),
          transform(col("_dm"), x => x.getField("_m").cast("float"))
            .as("new_emb"))
        .as[(Long, Seq[Float])].collect().toMap
      val next = cents.map { case (cid, prev) =>
        (cid, means.getOrElse(cid, prev)) }
      lastMaxShift = cents.zip(next).map { case ((_, a), (_, b)) =>
        a.zip(b).map { case (x, y) => math.abs(x.toDouble - y.toDouble) }
          .foldLeft(0.0)(math.max)
      }.foldLeft(0.0)(math.max)
      cents = next
    }
    cents.toDF("cent_id", "cent_emb")
    } finally proj.unpersist(blocking = false)
  }

  /** [[kmeansCentroids]] generalized to INDEPENDENT trainings per group
    * in one distributed pass — the product-quantization shape (one
    * k-means per subspace): looping the single-space trainer m times
    * costs m× the jobs and m corpus scans per round; here every round is
    * ONE broadcast of all groups' centroids (joined on the group key, so
    * a row only meets its own group's centroids), one `max_by`
    * assignment agg and one exact-decimal mean agg keyed by (group,
    * centroid), regardless of how many groups train. Per-group math is
    * identical to [[kmeansCentroids]] (same init rule, tie-break,
    * decimal means, empty-cluster retention), so the per-group SQL
    * replay chains stay valid. Driver state: groups × k × dim floats. */
  def kmeansCentroidsGrouped(corpus: DataFrame, grpCol: String,
      idCol: String, embCol: String, initStride: Long, iters: Int,
      dim: Int, initCap: Long = Long.MaxValue): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    require(initStride >= 1, s"initStride must be >= 1, got $initStride")
    require(iters >= 0, s"iters >= 0, got $iters")
    require(initCap >= 1, s"initCap must be >= 1, got $initCap")
    val proj = corpus.select(col(grpCol).cast("int").as("_g"),
      col(idCol).cast("long").as("_id"), col(embCol).as("_e")).persist()
    proj.count()
    try {
      // `initCap` bounds k independently of corpus size (seed ids below
      // stride·cap): a stride-only init grows k linearly with the data,
      // which turns every downstream vector×centroid pass quadratic.
      var cents: Seq[(Int, Long, Seq[Float])] = proj
        .filter(col("_id") % initStride === 0 &&
          (if (initCap == Long.MaxValue) lit(true)
           else col("_id") < lit(initStride * initCap)))
        .as[(Int, Long, Seq[Float])].collect().toSeq
        .sortBy(t => (t._1, t._2))
      require(cents.nonEmpty, "initStride selected no init centroids")
      for (_ <- 1 to iters) {
        val centsDf = cents.toDF("_g", "cent_id", "cent_emb")
        val assigned = proj
          .join(broadcast(centsDf), Seq("_g"))
          .withColumn("_sim", Similarity.cosine(col("_e"), col("cent_emb"), dim))
          .groupBy("_g", "_id").agg(first(col("_e")).as("_e"),
            max_by(col("cent_id"), struct(col("_sim"), -col("cent_id")))
              .as("_cid"))
        val means = assigned
          .select(col("_g"), col("_cid"),
            posexplode(col("_e")).as(Seq("_d", "_v")))
          .groupBy("_g", "_cid", "_d")
          .agg((sum(col("_v").cast("double").cast(DecimalType(28, 12)))
            .cast("double") / count(lit(1))).as("_m"))
          .groupBy("_g", "_cid")
          .agg(array_sort(collect_list(struct(col("_d"), col("_m")))).as("_dm"))
          .select(col("_g"), col("_cid"),
            transform(col("_dm"), x => x.getField("_m").cast("float"))
              .as("new_emb"))
          .as[(Int, Long, Seq[Float])].collect()
          .map(t => (t._1, t._2) -> t._3).toMap
        cents = cents.map { case (g, cid, prev) =>
          (g, cid, means.getOrElse((g, cid), prev)) }
      }
      cents.toDF(grpCol, "cent_id", "cent_emb")
    } finally proj.unpersist(blocking = false)
  }

  /** DuckDB CTE chain replaying [[kmeansCentroids]] exactly: unrolled
    * fixed rounds, each = argmax-cosine assignment (ties to lowest
    * cent_id), exact-decimal per-dim means re-listed in dimension order
    * and cast to FLOAT, empty clusters coalescing to the previous
    * round's centroid. The final CTE is `cents` — splice with
    * `WITH $kmeansCentsSql, <rest>`. */
  /** The CAPACITY-DERIVED init stride: `max(1, n div targetCells)`, so
    * the centroid count stays ≈ targetCells at ANY corpus size and the
    * whole k-means training is O(n · targetCells) — LINEAR in the
    * corpus. A FIXED stride (the fixture trainers' 53) instead grows
    * the centroid count with the corpus, making the assignment step
    * n·(n/stride): structurally quadratic, and measured as the one
    * convex curve in the ×100 scale probe (q121, BENCH_NOTES
    * round-15). ids are assumed dense from 0 (the testdata layout; on
    * sparse ids the stride still bounds the INIT set, just less
    * tightly). One count() driver round-trip. */
  def strideForCells(corpus: DataFrame, idCol: String,
      targetCells: Long): Long = {
    require(targetCells >= 1, s"targetCells must be >= 1, got $targetCells")
    math.max(1L, corpus.select(col(idCol)).count() / targetCells)
  }

  /** [[strideForCells]]' DuckDB spelling (same floor-div arithmetic). */
  def strideForCellsSql(from: String, targetCells: Long): String =
    s"greatest(1, (SELECT count(*) FROM $from) // $targetCells)"

  def kmeansCentsSql(initStride: Long, iters: Int,
      from: String = "embeddings", idCol: String = "vec_id",
      embCol: String = "embedding", prefix: String = "",
      dim: Int = Similarity.Dim, initCap: Long = Long.MaxValue,
      strideSqlOverride: Option[String] = None): String = {
    val p = prefix
    require(strideSqlOverride.isEmpty || initCap == Long.MaxValue,
      "initCap literal arithmetic needs a literal stride")
    val strideSql = strideSqlOverride.map(s => s"($s)")
      .getOrElse(initStride.toString)
    val cap =
      if (initCap == Long.MaxValue) ""
      else s" AND $idCol < ${initStride * initCap}"
    val init =
      s"""${p}cents0 AS (
         |  SELECT $idCol AS cent_id, $embCol AS cent_emb
         |  FROM $from WHERE $idCol % $strideSql = 0$cap)""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"""${p}asg$r AS (
         |  SELECT $idCol, $embCol, cent_id FROM (
         |    SELECT e.$idCol, e.$embCol, c.cent_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.$idCol
         |        ORDER BY ${Similarity.Sql.cosineDim(s"e.$embCol", "c.cent_emb", dim)} DESC,
         |          c.cent_id) AS rn
         |    FROM $from e CROSS JOIN ${p}cents${r - 1} c) t WHERE rn = 1),
         |${p}dims$r AS (
         |  SELECT cent_id, UNNEST($embCol) AS v,
         |    UNNEST(range(1, len($embCol) + 1)) AS d
         |  FROM ${p}asg$r),
         |${p}mean$r AS (
         |  SELECT cent_id, list(CAST(m AS FLOAT) ORDER BY d) AS new_emb
         |  FROM (SELECT cent_id, d,
         |      CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
         |        / COUNT(*) AS m
         |    FROM ${p}dims$r GROUP BY cent_id, d) s
         |  GROUP BY cent_id),
         |${p}cents$r AS (
         |  SELECT c.cent_id, COALESCE(m.new_emb, c.cent_emb) AS cent_emb
         |  FROM ${p}cents${r - 1} c LEFT JOIN ${p}mean$r m USING (cent_id))""".stripMargin
    }
    val alias = s"${p}cents AS (SELECT cent_id, cent_emb FROM ${p}cents$iters)"
    (init +: rounds :+ alias).mkString(",\n")
  }
}
