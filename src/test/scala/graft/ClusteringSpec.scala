package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** The deterministic Lloyd's trainer: bit-identical across runs,
  * convergent on separable data (fixpoint reached and held), empty
  * clusters retained — the properties the q28 oracle's SQL replay of
  * training depends on. */
class ClusteringSpec extends SparkSpec {

  // Three well-separated directional blobs (cosine geometry): ids 0–29
  // point near +x, 30–59 near +y, 60–89 near +z, with small
  // deterministic per-id jitter. Stride 30 seeds exactly one centroid
  // inside each blob (ids 0, 30, 60).
  private def blobs = {
    import spark.implicits._
    (0 until 90).map { i =>
      val blob = i / 30
      val base = Array.fill(4)(0.02f)
      base(blob) = 1.0f
      base((blob + 1) % 4) = 0.05f + (i % 7) * 0.01f
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
  }

  test("kmeans is deterministic: two trainings emit identical centroids") {
    def train() = Clustering.kmeansCentroids(blobs, "vec_id", "embedding",
      initStride = 30, iters = 3).orderBy("cent_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toList
    val a = train()
    val b = train()
    assert(a == b, "exact-decimal means must make training run-stable")
    assert(a.map(_._1) == List(0L, 30L, 60L))
  }

  test("kmeans converges on separable blobs and holds the fixpoint") {
    val c3 = Clustering.kmeansCentroids(blobs, "vec_id", "embedding", 30, 3)
      .orderBy("cent_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toList
    val shiftAt3 = Clustering.lastMaxShift
    val c4 = Clustering.kmeansCentroids(blobs, "vec_id", "embedding", 30, 4)
      .orderBy("cent_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toList
    assert(c3 == c4, "separable blobs must reach a fixpoint by round 3")
    assert(Clustering.lastMaxShift == 0.0,
      s"fixpoint round must have zero centroid movement, got ${Clustering.lastMaxShift}")
    assert(shiftAt3 < 0.05, s"late-round drift too large: $shiftAt3")
    // Each centroid must sit inside its blob: dominant coordinate = blob.
    c3.zipWithIndex.foreach { case ((_, emb), b) =>
      assert(emb.indexOf(emb.max) == b, s"centroid $b strayed: $emb")
    }
  }

  test("an empty cluster keeps its previous centroid") {
    import spark.implicits._
    // Two seeds (ids 0, 40) with IDENTICAL vectors everywhere: every
    // assignment ties and resolves to the lowest cent_id, so cluster 40
    // receives no members and must retain its init vector verbatim.
    val flat = (0 until 80).map(i => (i.toLong, Seq(1.0f, 0.5f, 0.25f, 0.0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
    val cents = Clustering.kmeansCentroids(flat, "vec_id", "embedding",
      initStride = 40, iters = 2).orderBy("cent_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toList
    assert(cents.map(_._1) == List(0L, 40L))
    assert(cents(1)._2 == List(1.0f, 0.5f, 0.25f, 0.0f),
      "empty cluster must keep its previous centroid")
  }

  test("strideForCells: centroid count is capacity-bound at any corpus size") {
    import spark.implicits._
    // The linear-training contract: stride = max(1, n div target), so
    // the INIT centroid count is ≈ target regardless of n — at 10× the
    // corpus a fixed stride would grow cells 10× (the quadratic
    // assignment the ×100 probe measured on q121); the derived stride
    // keeps them flat.
    for (n <- Seq(100L, 1000L, 10000L)) {
      val df = (0L until n).map(i => (i, Seq(1.0f, 0.0f)))
        .toDF("vec_id", "embedding")
      val stride = Clustering.strideForCells(df, "vec_id", targetCells = 16)
      assert(stride == math.max(1L, n / 16))
      val cells = (0L until n).count(_ % stride == 0)
      assert(cells >= 16 && cells <= 17,
        s"n=$n stride=$stride gives $cells init cells — must stay ≈ 16")
    }
    // Degenerate floor: fewer vectors than target cells → stride 1
    // (every vector seeds — training can never request cells it lacks).
    val tiny = (0L until 5L).map(i => (i, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    assert(Clustering.strideForCells(tiny, "vec_id", 16) == 1L)
  }
}
