package graft
/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line of per-query seconds.
  * Caches left behind by operators that persist intermediates (MinHash /
  * SimHash banding) are cleared between queries so each timing is cold
  * and memory stays flat across the suite. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Sessions.local(cpus)
    // Dev-only filter: comma-separated query names (unset = full suite).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    // Per-query JVM vitals on stderr (stdout stays one parseable JSON
    // line): code-cache occupancy, cumulative JIT + GC time, loaded-class
    // count — the counters that explain positional slowdowns (a query
    // running 10x slower mid-suite than in isolation is a JIT/GC symptom,
    // not a plan property).
    def vitals(): String = {
      import scala.jdk.CollectionConverters._
      import java.lang.management.{ManagementFactory => mf}
      val code = mf.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .map(p => s"${p.getName.stripPrefix("CodeHeap '").stripSuffix("'")}=" +
          s"${p.getUsage.getUsed / 1024 / 1024}M")
        .mkString(" ")
      val jit = mf.getCompilationMXBean.getTotalCompilationTime
      val gc = mf.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
      val cls = mf.getClassLoadingMXBean.getLoadedClassCount
      s"$code jit=${jit}ms gc=${gc}ms classes=$cls"
    }
    // Durable per-query record, appended + flushed as each query lands:
    // a truncated stdout capture (it has happened to the round artifact)
    // can lose the one summary line, but not this file.
    val partial = new java.io.PrintWriter(new java.io.FileWriter(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PARTIAL", "BENCH_PARTIAL.jsonl"),
      false), true)
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // A failed query must be VISIBLY broken in the JSON (-1 seconds +
      // an errors entry), never a plausible positive wall-time.
      val err = try { fn(spark, sfDir).count(); None }
        catch { case t: Throwable => Some(t.toString) }
      // Operator-registered caches first (precise), then the catalog
      // cache (cold per-query timing).
      graft.engine.Caches.release()
      spark.catalog.clearCache()
      val sec = if (err.isEmpty) (System.nanoTime() - t0) / 1e9 else -1.0
      System.err.println(f"[bench] $name%-24s $sec%8.2f s  ${vitals()}" +
        err.map(e => s"  ERR $e").getOrElse(""))
      partial.println(s"""{"q":"$name","sec":$sec,"sf":"$sfDir"}""")
      name -> (sec, err)
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, (v, _)) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, (_, Some(e))) =>
      jstr(k) + ":" + jstr(e.take(300)) }
    val errJson = if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    val total = results.values.map(_._1).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson,"sf":"$sfDir"}"""
    // The one parseable stdout line, duplicated on stderr and in the
    // partial file so no single truncated capture can lose the run.
    println(line)
    System.err.println(line)
    partial.println(line)
    partial.close()
    spark.stop()
  }
}
