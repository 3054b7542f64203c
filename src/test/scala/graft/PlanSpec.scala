package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{StarSchema, Tables}
import graft.operators.Similarity

/** Physical-plan shape assertions — the scale properties the operators
  * promise (broadcast dims, pruning/pushdown into the scan, partial
  * aggregation, no nested-loop joins) locked in as tests so a plan
  * regression fails CI rather than a 100 TB run. */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String = {
    // Cached plan fragments from other suites would substitute
    // InMemoryRelation for the scans these assertions inspect.
    spark.catalog.clearCache()
    df.collect() // let AQE finalize so the string shows executed joins
    df.queryExecution.executedPlan.toString
  }

  test("wide view: every dim join is a broadcast hash join, no shuffles for dims") {
    val p = plan(StarSchema.wideView(spark, sf).limit(1))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"expected >=4 broadcast dim joins in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("column pruning reaches the lineitem scan") {
    // A 2-column projection must not read measure columns.
    val df = StarSchema.wideView(spark, sf).select("month", "airline_name")
    val p = plan(df.limit(1))
    val lineitemScan = p.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("lineitem"))
      .mkString("\n")
    assert(lineitemScan.nonEmpty)
    assert(!lineitemScan.contains("l_extendedprice") && !lineitemScan.contains("l_quantity"),
      s"measure columns not pruned from scan: $lineitemScan")
  }

  test("filter pushdown reaches the parquet scan") {
    val df = Tables.lineitem(spark, sf).filter(col("l_quantity") > 40)
      .select("l_orderkey")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]") ||
      p.contains("GreaterThan(l_quantity,40"),
      s"filter not pushed into scan:\n$p")
  }

  test("embedding near-dup runs as a partitioned equi-join, never a nested loop") {
    val df = Similarity.nearDupPairs(Tables.embeddings(spark, sf), threshold = 0.4)
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"quadratic join shape leaked into the plan:\n$p")
  }

  test("bucketed CTAS joins without any exchange (co-located fact join)") {
    import graft.engine.Sinks
    Sinks.ctasBucketed(spark, "graft_li_b",
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      buckets = 8, bucketCol = "l_orderkey")
    Sinks.ctasBucketed(spark, "graft_ord_b",
      Tables.orders(spark, sf).select("o_orderkey", "o_orderdate"),
      buckets = 8, bucketCol = "o_orderkey")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_li_b")
        .join(spark.table("graft_ord_b"),
          col("l_orderkey") === col("o_orderkey"))
      val p = plan(joined)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q124 bucketed fact join: neither join input exchanges (agg exchange only)") {
    val df = SparkEntry.queries("q124_bucketed_join")(spark, sf)
    val p = plan(df)
    assert(p.contains("SortMergeJoin"), s"merge hint not honored:\n$p")
    // The bucketed layout must satisfy the join's distribution on both
    // sides; the only hash exchange left is the group-by's own.
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join input still shuffles:\n$p")
  }

  test("rollup aggregation is two-phase (map-side partial + final)") {
    val df = graft.engine.Aggregates.airlineMonthlyPerformance(
      StarSchema.wideView(spark, sf))
    val p = plan(df)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final HashAggregate pair in:\n$p")
  }

  test("prefix-Jaccard verify uses the merge kernel, not per-pair hash sets") {
    // The q43 verify must evaluate as sorted_intersect_count inside
    // codegen; ArrayIntersect/ArrayUnion build per-pair hash sets of
    // boxed strings (measured 2.3× slower) and must not reappear.
    import graft.operators.Dedup
    val df = Dedup.prefixJaccardPairs(Tables.documents(spark, sf),
      "doc_id", "text", n = 3, threshold = 0.5)
    val p = plan(df)
    assert(p.contains("sorted_intersect_count"),
      s"merge kernel missing from verify plan:\n$p")
    assert(!p.contains("array_intersect") && !p.contains("array_union"),
      s"hash-set array ops leaked back into the verify:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("text-feature path has no interpreted higher-order functions") {
    // The r3/r4 late-suite bench collapse was interpreted lambda HOFs
    // (ArrayFilter/ArrayTransform/ArrayAggregate) in the per-row text
    // path; this pins the fix. The q29 feature sweep and the q39 quality
    // gate must evaluate as native kernels (marker_hits/poly_fingerprint/
    // simhash/word_shingles) inside WholeStageCodegen, with no lambda HOF
    // nodes anywhere in the executed plan.
    import graft.functions.TextFunctions
    val docs = Tables.documents(spark, sf)
    val q29ish = docs.select(
      TextFunctions.qualityScore(col("text")).as("quality"),
      TextFunctions.langId(col("text")).as("lang_id"),
      TextFunctions.fingerprintPoly(col("text")).as("fp_poly"))
    val p = plan(q29ish.limit(1))
    for (hof <- Seq("ArrayFilter", "ArrayTransform", "ArrayAggregate",
        "LambdaFunction"))
      assert(!p.contains(hof), s"interpreted HOF $hof leaked into:\n$p")
    assert(p.contains("marker_hits") && p.contains("poly_fingerprint"),
      s"native kernels missing from:\n$p")
    // Whole-stage codegen renders as a `*(n)` stage marker on the Project.
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).nonEmpty,
      s"text projection fell out of whole-stage codegen:\n$p")
  }

  test("quality audit runs every check in ONE pass over ONE scan") {
    import graft.operators.QualityReport
    val df = QualityReport.audit(Tables.orders(spark, sf),
      QualityReport.ordersChecks())
    // AQE prints Final and Initial sections; inspect only the final one.
    val p = plan(df).split("== Initial Plan ==").head
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"audit must scan its input exactly once:\n$p")
  }

  test("chunking plans zero exchanges — it never leaves the scan stage") {
    import graft.operators.CorpusStats
    val df = CorpusStats.chunk(Tables.documents(spark, sf),
      "doc_id", "text", chunkTokens = 16)
    val p = plan(df).split("== Initial Plan ==").head
    assert(!p.contains("Exchange"),
      s"chunking must not shuffle:\n$p")
  }

  test("funnel, upsert and snapshot diff stay equi-join shaped") {
    import graft.operators.{EventAnalytics, Merge}
    val ordersDf = Tables.orders(spark, sf)
    val totals = ordersDf.groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"))
    val t2 = ordersDf.where(month(col("o_orderdate")) <= 6)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
    for (df <- Seq(EventAnalytics.funnel(Tables.events(spark, sf)),
        Merge.upsert(t2, totals, "o_custkey"),
        Merge.snapshotDiff(t2, totals, "o_custkey"))) {
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"nested-loop shape leaked into:\n$p")
    }
  }

  test("PII scrub and embedding quantization are map-only: no exchange in the plan") {
    import graft.operators.Privacy
    val p = plan(Privacy.scrubPii(Tables.documents(spark, sf), "text"))
    assert(!p.contains("Exchange"), s"scrub should never shuffle:\n$p")
    val pq = plan(Similarity.quantizeEmbeddings(Tables.embeddings(spark, sf)))
    assert(!pq.contains("Exchange"), s"quantize should never shuffle:\n$pq")
    assert(pq.contains("vector_quantize") && pq.contains("vector_max_abs"),
      s"native kernels missing from:\n$pq")
    assert(!p.contains("BatchEvalPython") && !p.contains("SQLUDF"),
      s"scrub must stay on codegen'd builtins:\n$p")
  }

  test("decontamination broadcasts the eval side; corpus never nested-loops") {
    import graft.operators.Curation
    val docs = Tables.documents(spark, sf)
    val p = plan(Curation.decontaminate(docs,
      docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", n = 8))
    assert(p.contains("BroadcastHashJoin"),
      s"eval shingle set should broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"no nested loop allowed:\n$p")
  }

  test("unigram LM scoring broadcasts the vocab and total; top-k cut never full-sorts") {
    import graft.operators.CorpusStats
    val p = plan(CorpusStats.unigramLogProb(Tables.documents(spark, sf),
      "doc_id", "text", vocabSize = 100))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      s"vocab lookup should be a broadcast join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"vocab cut should plan as TakeOrdered, not Sort+Limit:\n$p")
    // The 1-row total legitimately plans as a broadcast nested loop
    // (cross with a broadcast scalar frame); a CartesianProduct — both
    // sides shuffled — would be the actual scale bug.
    assert(!p.contains("CartesianProduct"),
      s"the 1-row total must ride a broadcast, not a cartesian:\n$p")
  }

  test("temperature mix broadcasts budgets; packed examples keep one doc-keyed shuffle") {
    import graft.operators.{Curation, Sampling}
    val pMix = plan(Sampling.temperatureMixSample(Tables.documents(spark, sf),
      "doc_id", "text", totalTokens = 20000L))
    assert("BroadcastHashJoin".r.findAllIn(pMix).size >= 1,
      s"per-language budgets should broadcast onto the fact:\n$pMix")
    assert(!pMix.contains("CartesianProduct"))
    // Build AFTER the cache clear: the operator materializes its
    // prefix-sum intermediate during construction, and the final plan
    // must read that cache — plan() would wipe it first.
    spark.catalog.clearCache()
    val dfPack = Curation.materializePackedSequences(
      Tables.documents(spark, sf), "doc_id", "text", binTokens = 2048)
    dfPack.collect()
    val pPack = dfPack.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!pPack.contains("CartesianProduct") &&
      !pPack.contains("BroadcastNestedLoopJoin"))
    // Text rides the assignment shuffle (carryCols): the final plan
    // reads the cached prefix-sum frame — it must NOT re-scan the
    // corpus and re-join the text by doc id.
    assert("FileScan parquet".r.findAllIn(pPack).size <= 1,
      s"packed-example build must not re-scan the corpus:\n$pPack")
    assert(!pPack.contains("SortMergeJoin"),
      s"no doc-keyed re-join allowed:\n$pPack")
    graft.engine.Caches.release()
  }

  test("grouping sets / unpivot: ONE Expand pass each, never a union of jobs") {
    val gs = SparkEntry.queries("q111_grouping_sets")(spark, sf)
    val pGs = plan(gs).split("== Initial Plan ==").head
    assert("Expand".r.findAllIn(pGs).size == 1,
      s"grouping sets must be one expand+agg pass:\n$pGs")
    assert(!pGs.contains("Union"),
      s"grouping sets must not union per-set jobs:\n$pGs")
    val up = SparkEntry.queries("q113_unpivot")(spark, sf)
    val pUp = plan(up).split("== Initial Plan ==").head
    assert(pUp.contains("Expand"),
      s"unpivot lowers to an Expand projection:\n$pUp")
    assert(!pUp.contains("Union") && !pUp.contains("Join"),
      s"unpivot must not plan a union/join:\n$pUp")
  }

  test("q109 regional revenue: dim joins broadcast, fact joins equi, no nested loop") {
    val df = StarSchema.regionalRevenue(spark, sf, "ASIA", 1997)
    val p = plan(df)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"nation and region must broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"quadratic join leaked into the 5-table tree:\n$p")
  }

  test("q107: dynamic partition pruning fires and reads only the quarter's months") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.engine.{Ingest, Sinks}
    val path = s"${Sinks.scratch}/planspec_dpp_fact"
    Sinks.writeParquet(
      Tables.lineitem(spark, sf)
        .withColumn("ship_month", month(col("l_shipdate"))),
      path, "overwrite", Seq("ship_month"))
    // AQE off for this one assertion: it wraps the scan in query stages
    // that hide FileSourceScanExec from a plain plan traversal; DPP
    // itself is independent of AQE.
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Ingest.dppQuarterAgg(spark, path, quarter = 1)
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains("planspec_dpp_fact")) => f
      }
      assert(scans.nonEmpty, "fact scan not found in executed plan")
      val scan = scans.head
      assert(scan.partitionFilters.mkString(",").contains("dynamicpruning"),
        s"no dynamicpruning partition filter on the fact scan: ${scan.partitionFilters}")
      // Post-run driver metric: only the 3 quarter-1 month directories
      // were opened (12 exist).
      val partsRead = scan.metrics.get("numPartitions").map(_.value)
      assert(partsRead.contains(3L),
        s"expected 3 partitions read after pruning, got $partsRead")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("DSIR selection cuts via TakeOrdered, never a global sort or window") {
    val p = plan(graft.operators.Selection.dsirSelect(
      Tables.documents(spark, sf), col("lang") === "en", topN = 100))
    assert(p.contains("TakeOrderedAndProject"),
      s"expected a distributed TakeOrdered cut in:\n$p")
    assert(!p.contains("Window"), s"unexpected window (global rank?) in:\n$p")
    graft.engine.Caches.release()
  }

  test("video frame-sampling is map-only up to the final order") {
    // The codec stage must add NO shuffle: documents scan -> encode ->
    // decode are one fused map chain; the only exchange allowed is the
    // orderBy's range partitioning (and AQE's reads of it).
    val df = graft.SparkEntry.queries("q125_video_frames")(spark, sf)
    val p = plan(df)
    val exchanges = "Exchange (hashpartitioning|SinglePartition)".r.findAllIn(p).size
    assert(exchanges == 0,
      s"codec path should not hash/single-partition exchange, plan:\n$p")
  }

  test("pHash near-dup: banded candidates via equi-join, never all-pairs") {
    // The self-join must key on (band_idx, band_val) — a partitioned
    // equi-join whose candidate count is bounded by band collisions;
    // a nested-loop/cartesian shape here is the all-pairs quadratic
    // the banding exists to avoid.
    val df = graft.SparkEntry.queries("q141_phash_neardup")(spark, sf)
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"quadratic join shape leaked into the pHash plan:\n$p")
    assert(p.contains("band_idx") && p.contains("band_val"),
      s"expected the band-keyed join in:\n$p")
    graft.engine.Caches.release()
  }

  test("BPE tokenization broadcasts the trained vocabulary; corpus never shuffles by word") {
    // The corpus-sized token stream must meet the vocab via a
    // broadcast hash join — a shuffle keyed on `word` would move the
    // whole corpus for a vocabulary-sized lookup table.
    val p = plan(graft.operators.CorpusStats.bpeTokenize(
      Tables.documents(spark, sf), "doc_id", "text", rounds = 2))
    assert(p.contains("BroadcastHashJoin"),
      s"expected the vocab broadcast join in:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled by word for a vocab lookup:\n$p")
    graft.engine.Caches.release()
  }

  test("BPE pair counting is two-phase (map-side partial + final)") {
    // One merge round's REAL pair-count stage must partial-aggregate
    // before its exchange — at corpus scale the explode emits
    // symbols-1 rows per word and only (pair, partial-count) rows may
    // cross the wire.
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[A-Za-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        concat(array_remove(split(col("word"), ""), ""),
          array(lit("</w>"))))
    val p = plan(graft.operators.CorpusStats.bpePairCounts(words))
    // Two aggregations in the chain (word-freq, pair-count), each
    // partial+final => 4 HashAggregates; the pair count's partial pair
    // must appear after the explode (the last two in the plan string).
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"expected partial+final aggregation for both stages in:\n$p")
  }

  test("stored MinHash index query: pruned parquet reads, no cartesian, no BNLJ") {
    // The q148 path reads two stored tables; the band-join side must
    // scan (id, band) only and the verify join-back (id, sh) only —
    // over-reading the shingle arrays into the band join would ship
    // every reference document's shingles through the candidate
    // shuffle.
    val dir = s"${graft.engine.Sinks.scratch}/planspec_minhash_idx"
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    val docs = Tables.documents(spark, sf)
    graft.operators.Dedup.buildMinhashIndex(
      docs.filter(col("doc_id") % 3 === 0), dir, "doc_id", "text",
      n = 3, numHashes = 64, bands = 32)
    val df = graft.operators.Dedup.minhashNearDupFromIndex(
      docs.filter(col("doc_id") % 3 =!= 0), dir, "doc_id", "text", 0.5)
    df.collect()
    val scans = df.queryExecution.executedPlan.toString
    assert(!scans.contains("CartesianProduct") &&
      !scans.contains("BroadcastNestedLoopJoin"), s"non-equi join in:\n$scans")
    // Column pruning must reach both stored-table scans.
    val bandScan = "ReadSchema: [^\\n]*band".r.findFirstIn(scans)
    assert(bandScan.exists(s => !s.contains("sh")),
      s"band-join scan reads more than (id, band): $bandScan")
    graft.engine.Caches.release()
  }

  test("stored-model tokenization: vocabulary broadcasts, corpus never shuffles by word") {
    // q150's counting join must broadcast the segmented vocabulary —
    // a sort-merge join would shuffle the whole corpus by word for a
    // vocab-sized lookup (the q146 contract, over stored state).
    val dir = s"${graft.engine.Sinks.scratch}/planspec_bpe_model"
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    val docs = Tables.documents(spark, sf)
    graft.operators.CorpusStats.saveBpeModel(
      docs.filter(col("doc_id") % 3 === 0), "text", rounds = 3, dir)
    val p = plan(graft.operators.CorpusStats.bpeTokenizeFromModel(
      docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", dir))
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast vocab join in:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled by word for a vocab lookup:\n$p")
  }

  test("decontam excision: eval gram set broadcasts, everything else equi/window") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val p = plan(Dedup.exciseContaminated(
      docs.filter(col("doc_id") % 3 =!= 0),
      docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", k = 24))
    assert(p.contains("BroadcastHashJoin"),
      s"small eval gram set should broadcast onto the train grams:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"no nested loop allowed:\n$p")
    graft.engine.Caches.release()
  }

  test("bigram LM: count tables broadcast for a small reference; V rides a broadcast") {
    import graft.operators.CorpusStats
    val docs = Tables.documents(spark, sf)
    val p = plan(CorpusStats.bigramLogProb(
      docs.filter(col("doc_id") % 3 =!= 0),
      docs.filter(col("doc_id") % 97 === 0), "doc_id", "text"))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"c2/c1 lookups should broadcast for a small reference:\n$p")
    // Same contract as the unigram test: the 1-row V frame may plan as
    // a broadcast nested loop; a CartesianProduct would be the bug.
    assert(!p.contains("CartesianProduct"),
      s"the 1-row V must ride a broadcast, not a cartesian:\n$p")
    graft.engine.Caches.release()
  }

  test("ANN recall evaluation joins rankings equi-shaped, never nested-loop on ids") {
    import graft.operators.{Clustering, Similarity}
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter(col("vec_id") < 10)
    val cents = Clustering.kmeansCentroids(
      emb, "vec_id", "embedding", initStride = 53, iters = 2)
    val df = Similarity.recallAtK(
      Similarity.bruteForceTopK(qs, emb, k = 5),
      Similarity.ivfTopKWith(qs, emb, k = 5, cents, nProbe = 3), k = 5)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // The hit join on (query_id, neighbor_id) must be an equi join;
    // the rankings' own broadcast nested loops (tiny query side vs
    // corpus) are their documented shape, so only CartesianProduct —
    // both sides shuffled — is banned outright here.
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    graft.engine.Caches.release()
  }

  test("NFC dedup is one hash aggregation with the kernel fused into the scan") {
    import graft.operators.Curation
    val df = Curation.nfcDedupGroups(Tables.documents(spark, sf),
      "doc_id", "text")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("nfc_normalize"), s"kernel missing from the plan:\n$p")
    // q22's plan family: partial/final hash aggregate pairs over ONE
    // exchange on the normalized key (countDistinct adds its expand/
    // second agg but no extra shuffle of the corpus scan).
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"dedup must be aggregation-only:\n$p")
  }

  test("bloom-pruned decontamination carries might_contain ahead of the gram join") {
    import graft.operators.Curation
    val docs = Tables.documents(spark, sf)
    val df = Curation.decontaminateBloomPruned(docs,
      docs.filter(col("doc_id") % 89 === 0), "doc_id", "text", n = 8)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"the map-side bloom prune is missing:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    graft.engine.Caches.release()
  }
}
