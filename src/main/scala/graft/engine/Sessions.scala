package graft.engine

import org.apache.spark.sql.SparkSession

/** One tuned SparkSession builder for every entry point (Bench, Verify,
  * dev probes), so plan-shaping configs are set in exactly one place.
  *
  * The AQE partition-coalescing settings are the load-bearing part:
  *
  *  - `coalescePartitions.parallelismFirst=false` — the default (`true`)
  *    refuses to coalesce below the cluster's default parallelism, so a
  *    3 MB shuffle still schedules 32 tasks and a 40-query suite drowns
  *    in per-task overhead. `false` is Spark's own documented
  *    recommendation for busy clusters: post-shuffle partitions track the
  *    64 MB advisory size, which collapses kilobyte-scale intermediates
  *    to one task locally while leaving 100 TB shuffles exactly as wide
  *    as their data demands.
  *  - `canChangeCachedPlanOutputPartitioning=true` — without it, cached
  *    plans pin the static `spark.sql.shuffle.partitions` fan-out, so
  *    every `persist()` in the dedup tier re-inflates tiny frames back to
  *    32 partitions.
  */
object Sessions {

  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // The library's own extensions ride every session: native-kernel
      // SQL functions + the range-join→binned-equi-join optimizer rule.
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.warehouse.dir", s"${Sinks.scratch}/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
