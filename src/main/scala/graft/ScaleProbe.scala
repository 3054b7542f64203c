package graft

/** Scale-probe main: measure the suite's most expensive queries at ×k
  * the benchmark corpus (default ×10 of sf0.1) against their same-JVM
  * 1× walls — the measured point behind the "plans hold at 100×"
  * claims, which until round 13 rested on plan-shape assertions alone.
  *
  * Protocol: synthesize the ×k corpus once ([[graft.engine.ScaleData]],
  * marker-gated), run each probe query once at 1× (doubling as the JVM
  * warm-up for its plan family), then once at ×k, and print ONE JSON
  * line `{"metric":"scale_probe","k":K,"queries":{"qNN":{"base":s,
  * "scaled":s,"ratio":r}},...}`. A ratio near k is linear scaling; a
  * ratio far above k on a non-IO query is a scale bug (quadratic
  * candidate growth, a flipped join) — see BENCH_NOTES.md "Scale
  * probe". Single runs on an oversubscribed host: read ratios as
  * coarse structure (linear vs quadratic), not ±10% performance.
  *
  * Query selection defaults to the top-10 by quiet-host median, i.e.
  * where the suite actually spends its time; override with
  * SPARK_GRAFT_SCALE_ONLY. */
object ScaleProbe {

  /** Top-10 by BENCH_BASELINE.json median as of round 16 (q209 leads,
    * the q214 incremental pipeline enters at #3; every member's ×10 —
    * and for the ANN/eval tier and the round-16 flagship/media probes
    * ×100 — points are in BENCH_NOTES.md's probe tables). */
  val DefaultQueries: Seq[String] = Seq(
    "q209_full_pipeline", "q182_stream_ann_ingest",
    "q214_incremental_pipeline", "q196_dedup_eval",
    "q121_ivfpq_topk", "q23_ngram_jaccard", "q117_pq_topk",
    "q210_adaptive_probe", "q173_stream_funnel_monitor",
    "q181_softdedup_weights")

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE_K", "10").toInt
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      s"${graft.engine.Sinks.scratch}/scale_x$k")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").toSeq).getOrElse(DefaultQueries)
    // A typo'd SCALE_ONLY name silently shrinking the probe would read
    // as "covered" — fail loudly instead (review finding).
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"SPARK_GRAFT_SCALE_ONLY names unregistered queries: ${unknown.mkString(",")}")
    val spark = graft.engine.Sessions.local(cpus)

    val t0 = System.nanoTime()
    graft.engine.ScaleData.synthesize(spark, baseDir, outDir, k)
    System.err.println(
      f"[scale] corpus ×$k at $outDir (${(System.nanoTime() - t0) / 1e9}%.1f s)")

    // Untimed fixture materialization for BOTH corpora, the Bench
    // discipline: a fixture-backed probe query (stored dedup/ANN/model
    // state) must measure the QUERY path at each scale, not a ×k index
    // training inside its scaled window — without this the ratio of a
    // stored-state query reads as its build cost (round-16 residual:
    // q214's first ×10 point carried four index builds).
    val fixtureSel = names.toSet.filter(SparkEntry.fixtureQueries)
    if (fixtureSel.nonEmpty) {
      val tw = System.nanoTime()
      Seq(baseDir, outDir).foreach { d =>
        try SparkEntry.warmFixtures(spark, d, fixtureSel)
        catch { case t: Throwable =>
          System.err.println(s"[scale] warmFixtures($d) FAILED: $t") }
        graft.engine.Caches.release()
        spark.catalog.clearCache()
      }
      System.err.println(
        f"[scale] warmFixtures ${(System.nanoTime() - tw) / 1e9}%.2f s (untimed)")
    }

    def n2(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    // The one parseable stdout line must survive hostile env paths —
    // same jstr contract as Bench's summary (review finding).
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def timed(name: String, dir: String): (Double, Seq[(String, Double)]) = {
      val s0 = System.nanoTime()
      val res = try { SparkEntry.queries(name)(spark, dir).count(); None }
        catch { case t: Throwable => Some(t.toString) }
      // Stage telemetry BEFORE the cache sweep (the Bench read order +
      // the Bench name guard — lastStageSeconds persists across
      // queries, so an unguarded read would attribute a pipeline's
      // stale stages to the next query): a staged query (q209/q214)
      // leaves one wall per stage — emitted at BOTH scales so a
      // superlinear stage is measured, not inferred from the total's
      // concavity.
      val stages =
        if (res.isEmpty &&
            (name.startsWith("q209_") || name.startsWith("q214_")))
          graft.operators.Pipeline.lastStageSeconds
        else Seq.empty
      graft.engine.Caches.release()
      spark.catalog.clearCache()
      val sec = (System.nanoTime() - s0) / 1e9
      System.err.println(f"[scale] $name%-26s $dir%-40s $sec%8.2f s" +
        res.map(e => s"  ERR $e").getOrElse(""))
      (if (res.isDefined) -1.0 else sec, stages)
    }

    // Untimed warm-up: the first timed query otherwise absorbs the
    // whole first-in-JVM ramp into its 1× BASE wall (measured 12.85×
    // in Bench), deflating its ratio — a quadratic regression in the
    // suite's most expensive query could still print "linear"
    // (review finding). On a marker-warm corpus this is the JVM's
    // first Spark action, so the warm-up matters most exactly then.
    names.headOption.foreach { name =>
      val (w, _) = timed(name, baseDir)
      System.err.println(f"[scale] warmup($name) $w%.2f s (discarded)")
    }
    def stageJson(stages: Seq[(String, Double)]): String =
      stages.map { case (s, sec) => jstr(s) + ":" + n2(sec) }
        .mkString("{", ",", "}")
    val rows = names.map { name =>
      val (base, baseStages) = timed(name, baseDir)
      val (scaled, scaledStages) = timed(name, outDir)
      val ratio = if (base > 0 && scaled >= 0) scaled / base else -1.0
      name -> ((base, scaled, ratio, baseStages, scaledStages))
    }
    val qJson = rows.map { case (name, (b, s, r, bs, ss)) =>
      val stagePart =
        if (bs.isEmpty && ss.isEmpty) ""
        else s""","stages_base":${stageJson(bs)},"stages_scaled":${stageJson(ss)}"""
      s"""${jstr(name)}:{"base":${n2(b)},"scaled":${n2(s)},"ratio":${n2(r)}$stagePart}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_probe","k":$k,"base_dir":${jstr(baseDir)},""" +
      s""""scaled_dir":${jstr(outDir)},"queries":$qJson}""")
    spark.stop()
  }
}
