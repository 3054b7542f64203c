package graft.engine

import org.apache.spark.sql.DataFrame

/** Scan-parallelism floor for CPU-heavy per-row work (guide §2.5 "input
  * skew": one huge unsplittable input leaves the cluster idle).
  *
  * The cost of shingling, PNG/WAV/GIF encode+decode, hashing and
  * tokenizing is per-ROW, not per-byte, so the parallelism of the stage
  * must track cores, not file sizes — but a small corpus stored as one
  * parquet file plans exactly one scan task, and every fused map stage
  * downstream of it serializes on one core (measured: the pHash family
  * ran at 1.0–1.5 busy cores on local[32]).
  */
object Partitioning {

  /** Spread an under-partitioned input across the cluster before
    * CPU-heavy per-row work. Source-file count is a logical-plan
    * metadata probe — unlike `df.rdd.getNumPartitions` it triggers no
    * physical planning at plan-build time. Few files ⇒ few scan tasks
    * (these corpora are single-row-group parquet, unsplittable below
    * file granularity); at 100 TB the file count dwarfs the core count
    * and this is the identity — no shuffle is added where scans are
    * naturally wide. */
  def parallelized(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length < p) df.repartition(p) else df
  }
}
