package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.{Drift, Similarity}

/** Streaming embedding-drift monitor — the deployment shape of
  * [[graft.operators.Drift.embeddingDrift]]: the reference corpus's SRP
  * sign-bucket histogram is built ONCE and stored (2^nBits rows of
  * parquet + the stored projection params, completion-marker lifecycle
  * like every stored artifact), then each arriving micro-batch of
  * vectors pays only its own signature projection and a histogram-sized
  * PSI against the stored counts, appending one
  * `(batch_id, psi, n_bins, n_ref, n_cur)` row per batch — the
  * "is today's embedding traffic still distributed like the corpus I
  * indexed" alarm, at per-batch cost independent of reference size.
  *
  * Exactly-once bookkeeping is the file-source checkpoint
  * ([[IncrementalIngest]]'s contract); `batch_id` is the checkpoint's
  * own monotone micro-batch id (+1 for 1-based reporting), so re-runs
  * resume numbering instead of double-reporting. */
object DriftMonitor {

  private val Marker = "_REF_SUCCESS"

  /** True iff `dir` holds a COMPLETED reference-histogram build. */
  def referenceExists(spark: SparkSession, dir: String): Boolean =
    graft.engine.Markers.exists(spark, dir, Marker)

  /** Build-once reference: the SRP bucket histogram of `refEmb`'s
    * `embedding` column plus the frozen projection params (queries
    * derive nBits/seed from the store — a monitor cannot drift from
    * the histogram it compares against). */
  def buildReference(refEmb: DataFrame, dir: String, nBits: Int = 6,
      seed: Long = 7L): Unit = {
    val spark = refEmb.sparkSession
    import spark.implicits._
    require(nBits >= 1 && nBits <= 16, s"need 1 <= nBits <= 16, got $nBits")
    graft.engine.Markers.gated(spark, dir, Marker) {
      Seq((nBits, seed)).toDF("n_bits", "seed")
        .write.mode("overwrite").parquet(s"$dir/params")
      refEmb.select(Similarity.srpSignature(nBits, seed).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n_ref"))
        .write.mode("overwrite").parquet(s"$dir/hist")
    }
  }

  /** Drain everything currently in `srcDir` (exactly-once via
    * `checkpointDir`), scoring each micro-batch against the stored
    * reference and appending its PSI row to `outDir`. */
  def runAvailable(spark: SparkSession, srcDir: String, schema: StructType,
      refDir: String, outDir: String, checkpointDir: String): Unit = {
    require(referenceExists(spark, refDir),
      s"no completed drift reference at $refDir — run buildReference first")
    val p = spark.read.parquet(s"$refDir/params").head()
    val (nBits, seed) = (p.getInt(0), p.getLong(1))
    val q = spark.readStream
      .schema(schema)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (mb: DataFrame, id: Long) =>
        // foreachBatch is AT-LEAST-once (a crash between this write
        // and the checkpoint commit re-executes the batch), so the
        // write must be idempotent per batch: dynamic partition
        // overwrite on batch_id makes a re-executed batch REPLACE its
        // own row instead of appending a duplicate alarm.
        Drift.psiFromRefCounts(
            spark.read.parquet(s"$refDir/hist"),
            mb.select(Similarity.srpSignature(nBits, seed).as("bucket")),
            "bucket")
          .withColumn("batch_id", lit(id + 1))
          .select("batch_id", "psi", "n_bins", "n_ref", "n_cur")
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** End-to-end two-run demo (the q116 contract applied to
    * monitoring): build the reference, land batch 1, drain (one PSI
    * row), land batch 2, drain again — the second run scores ONLY
    * batch 2, and the checkpoint numbers it batch 2 across runs. */
  def twoRunMonitor(spark: SparkSession, refEmb: DataFrame,
      batch1: DataFrame, batch2: DataFrame, scratchRoot: String,
      nBits: Int = 6, seed: Long = 7L): DataFrame = {
    val (ref, src, out, cp) = (s"$scratchRoot/ref", s"$scratchRoot/src",
      s"$scratchRoot/out", s"$scratchRoot/checkpoint")
    Seq(ref, src, out, cp).foreach(IncrementalIngest.deleteDir(spark, _))
    buildReference(refEmb, ref, nBits, seed)
    batch1.write.mode("append").parquet(src)
    runAvailable(spark, src, batch1.schema, ref, out, cp)
    batch2.write.mode("append").parquet(src)
    // batch2's OWN schema: the demo's batches happen to share one, but
    // reusing batch1.schema here would silently drop/null columns for
    // a caller whose second batch differs.
    runAvailable(spark, src, batch2.schema, ref, out, cp)
    // batch_id comes back as a PARTITION column (inferred int, listed
    // last) — restore the written long type and column order.
    spark.read.parquet(out)
      .select(col("batch_id").cast("long").as("batch_id"), col("psi"),
        col("n_bins"), col("n_ref"), col("n_cur"))
  }
}
