package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup

/** The complete PRODUCTION ingest-dedup loop, streamed: documents
  * arrive as files, every micro-batch is near-dup-checked against the
  * PERSISTED MinHash index (q148's stored state), batch-internal
  * near-dups collapse to one survivor, novel documents append to both
  * the clean corpus and the index — so the NEXT batch (and the next
  * day's run) dedups against everything accepted so far — and
  * rejected documents land in a quarantine table naming what they
  * matched. This composes the round's stored-state machinery into the
  * loop it exists for: [[Dedup.buildMinhashIndex]] once, then this
  * per arrival cadence, amortizing the reference corpus's
  * shingles/bands over every batch forever.
  *
  * Exactly-once and crash shape: the SOURCE side is exactly-once via
  * the checkpoint (a re-run resumes at the file log, like
  * [[IncrementalIngest]]). The three SINK writes inside a batch
  * (accepted parquet, rejected parquet, index append) are not one
  * transaction — plain parquet has no multi-table commit — but the
  * index append runs LAST and inside the marker window
  * ([[Dedup.appendToMinhashIndex]] drops `_INDEX_SUCCESS` for the
  * duration), so a crash mid-batch leaves a visibly-incomplete index
  * (rebuild/repair), never a silently half-deduped corpus; a table
  * format (Delta/Iceberg) supplies the transactional upgrade at
  * production, the same adjudication as the streaming upsert sink.
  *
  * Scale shape per batch: within-batch dedup is the q24 banded
  * self-join on the BATCH only (batches are bounded by the trigger,
  * not the corpus); the cross check is the q148 band equi-join of the
  * batch against the stored band table (|batch|·collisions, zero
  * reference recompute); the index append is O(|novel|). Driver state:
  * none beyond the connected-components convergence counters.
  */
object StreamingDedup {

  /** Drain everything currently in `srcDir` (exactly-once via
    * `checkpointDir`), deduplicating each micro-batch against
    * `indexDir` and batch-internally; novel docs append to
    * `acceptedDir` AND the index, victims to `rejectedDir` as
    * `(doc_id, matched_id, jaccard, reason)` with reason `ref_dup`
    * (matched the stored reference) or `batch_dup` (collapsed into a
    * same-batch survivor; jaccard is the pair that clustered it).
    * Contract: arriving ids are globally unique (never re-used across
    * batches) and disjoint from the indexed ids — the
    * [[Dedup.appendToMinhashIndex]] contract, checked nowhere by
    * design. */
  def runAvailable(spark: SparkSession, srcDir: String, schema: StructType,
      indexDir: String, acceptedDir: String, rejectedDir: String,
      checkpointDir: String, threshold: Double = 0.5): Unit = {
    require(Dedup.minhashIndexExists(spark, indexDir),
      s"no completed MinHash index at $indexDir — run buildMinhashIndex " +
        "over the reference corpus first")
    val q = spark.readStream
      .schema(schema)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        dedupBatch(batch, indexDir, acceptedDir, rejectedDir, threshold)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One micro-batch's dedup: within-batch collapse, cross check
    * against the stored index, three writes (accepted, rejected,
    * index append — append LAST, see the crash-shape note above).
    * Batch twin of the streaming path, public so the spec can prove
    * streaming == batch on identical arrivals. */
  def dedupBatch(batch: DataFrame, indexDir: String, acceptedDir: String,
      rejectedDir: String, threshold: Double): Unit = {
    val spark = batch.sparkSession
    val (n, numHashes, bands) = storedLshShape(spark, indexDir)
    val docs = graft.engine.Caches.materialized(
      batch.select(col("doc_id"), col("text")))
    // Within-batch collapse: q24 pairs at the INDEX's LSH shape (one
    // dedup policy end to end), q37 components, min-id survivor.
    val pairs = graft.engine.Caches.materialized(
      Dedup.minhashNearDup(docs, "doc_id", "text",
        n = n, numHashes = numHashes, bands = bands, threshold = threshold))
    val clusters = Dedup.dedupClusters(pairs.select("id_a", "id_b"))
    val batchSurvivors = graft.engine.Caches.materialized(
      Dedup.survivors(docs, "doc_id", clusters))
    // Batch victims carry the pair that clustered them (their best
    // same-batch match at the gate threshold).
    val batchVictims = pairs
      .select(col("id_b").as("doc_id"), col("id_a").as("matched_id"),
        col("jaccard"))
      .union(pairs.select(col("id_a").as("doc_id"),
        col("id_b").as("matched_id"), col("jaccard")))
      .join(batchSurvivors.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .groupBy("doc_id")
      .agg(max(struct(col("jaccard"), col("matched_id"))).as("m"))
      .select(col("doc_id"), col("m.matched_id").as("matched_id"),
        col("m.jaccard").as("jaccard"), lit("batch_dup").as("reason"))
    // Cross check: survivors vs the STORED reference state.
    val refMatches = graft.engine.Caches.materialized(
      Dedup.minhashNearDupFromIndex(batchSurvivors, indexDir,
        "doc_id", "text", threshold))
    val refVictims = refMatches
      .groupBy(col("new_id").as("doc_id"))
      .agg(max(struct(col("jaccard"), col("ref_id"))).as("m"))
      .select(col("doc_id"), col("m.ref_id").as("matched_id"),
        col("m.jaccard").as("jaccard"), lit("ref_dup").as("reason"))
    val novel = graft.engine.Caches.materialized(
      batchSurvivors.join(
        refVictims.select("doc_id"), Seq("doc_id"), "left_anti"))
    batchVictims.union(refVictims)
      .write.mode("append").parquet(rejectedDir)
    novel.write.mode("append").parquet(acceptedDir)
    // Index append LAST: the marker window covers the state mutation.
    Dedup.appendToMinhashIndex(novel, indexDir, "doc_id", "text")
    graft.engine.Caches.release()
  }

  /** The stored index's LSH shape — batches must band the same way
    * the index did or the pigeonhole guarantee breaks. */
  private def storedLshShape(spark: SparkSession,
      dir: String): (Int, Int, Int) = {
    val r = spark.read.parquet(s"$dir/params").head()
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }
}
