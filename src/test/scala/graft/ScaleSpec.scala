package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{ScaleData, StarSchema}
import graft.operators.Dedup

/** The scale probe's synthesis invariants and the ×10 plan shapes: the
  * scaled corpus must be k× the workload (distribution-preserving,
  * never quadratic in k), and the plans that make the suite fast at 1×
  * must keep their shapes one order of magnitude up — broadcast dim
  * joins stay broadcast, nothing flips to a nested-loop join. Runs on
  * ×10 of sf0.001 so CI stays fast; the measured sf0.1 probe is
  * [[graft.ScaleProbe]]. */
class ScaleSpec extends SparkSpec {

  private lazy val dir = {
    val out = s"${graft.engine.Sinks.scratch}/scale_spec_x10"
    ScaleData.synthesize(spark, sf, out, 10)
    out
  }

  private def plan(df: DataFrame): String = {
    spark.catalog.clearCache()
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("synthesis: facts scale x10 FK-consistent, dims stay 1x") {
    def n(d: String, t: String) = spark.read.parquet(s"$d/$t.parquet").count()
    for (t <- Seq("lineitem", "orders", "customer", "events", "documents",
        "embeddings"))
      assert(n(dir, t) == 10 * n(sf, t), s"$t must scale x10")
    for (t <- Seq("region", "nation", "supplier", "part"))
      assert(n(dir, t) == n(sf, t), s"dim $t must stay 1x")
    // FK integrity: every scaled lineitem still finds its order, so the
    // wide view (inner joins) is exactly 10x the base one.
    assert(StarSchema.wideView(spark, dir).count() ==
      10 * StarSchema.wideView(spark, sf).count())
  }

  test("synthesis is k-linear: near-dup and fuzzy pair populations scale exactly x10") {
    // Word tags keep cross-copy shingle spaces disjoint: the Jaccard
    // pair population is exactly 10 per-copy replicas of the base one.
    // A plain union (10-way identical texts) would be quadratic in k —
    // the probe would measure a different workload, not a bigger one.
    def docs(d: String) = spark.read.parquet(s"$d/documents.parquet")
    val basePairs = Dedup.ngramJaccardPairs(docs(sf), "doc_id", "text",
      n = 3, threshold = 0.5).count()
    val scaledPairs = Dedup.ngramJaccardPairs(docs(dir), "doc_id", "text",
      n = 3, threshold = 0.5).count()
    assert(scaledPairs == 10 * basePairs,
      s"jaccard pairs must scale x10 ($basePairs -> $scaledPairs)")
    graft.engine.Caches.release()
    // Two-letter name tags keep cross-copy Levenshtein >= 2: the fuzzy
    // join population is 10 per-copy replicas too.
    def cust(d: String) = spark.read.parquet(s"$d/customer.parquet")
    val baseFuzzy = Dedup.editDistancePairs(cust(sf), "c_name").count()
    val scaledFuzzy = Dedup.editDistancePairs(cust(dir), "c_name").count()
    assert(scaledFuzzy == 10 * baseFuzzy,
      s"fuzzy pairs must scale x10 ($baseFuzzy -> $scaledFuzzy)")
  }

  test("x10 plans keep their shapes: dim joins stay broadcast, no BNLJ anywhere") {
    // The fact side grew 10x while dims stayed put — exactly the growth
    // mode where a stats mis-estimate could flip a dim join to
    // sort-merge or (worse) a nested loop. The explicit broadcast hints
    // must hold at the executed plan.
    val p = plan(StarSchema.wideView(spark, dir).limit(1))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"expected >=4 broadcast dim joins at x10 in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
    // The airline rollup (the q32/q41 input) end-to-end at x10.
    val pAgg = plan(graft.engine.Aggregates.airlineMonthlyPerformance(
      StarSchema.wideView(spark, dir)))
    assert(pAgg.contains("BroadcastHashJoin") &&
      !pAgg.contains("BroadcastNestedLoopJoin"))
  }

  test("embedding rotation preserves norms (within-copy ANN geometry intact)") {
    // Rotation is norm-preserving, so every copy's vector norms equal
    // the base corpus's multiset of norms — spot-checked via the exact
    // decimal sum of squared norms, which must scale exactly x10.
    def sq(d: String) = spark.read.parquet(s"$d/embeddings.parquet")
      .select(aggregate(col("embedding"),
        lit(java.math.BigDecimal.ZERO).cast("decimal(30,6)"),
        (acc, x) => (acc + x.cast("decimal(30,6)") * x.cast("decimal(30,6)"))
          .cast("decimal(30,6)"))
        .as("n2"))
      .agg(sum("n2")).head().getDecimal(0)
    assert(sq(dir).compareTo(sq(sf).multiply(
      new java.math.BigDecimal(10))) == 0)
  }

  test("x10 continuation plans: excision windows stay per-doc equi, CDC and drift flat") {
    def docs(d: String) = spark.read.parquet(s"$d/documents.parquet")
    def emb(d: String) = spark.read.parquet(s"$d/embeddings.parquet")
    // Decontam excision at x10: the gram join stays equi (broadcast or
    // shuffled-hash), never a nested loop, and the only windows are
    // document-partitioned (no corpus-global sort).
    val pEx = plan(Dedup.exciseContaminated(
      docs(dir).filter(col("doc_id") % 3 =!= 0),
      docs(dir).filter(col("doc_id") % 3 === 0), "doc_id", "text", k = 24))
    assert(!pEx.contains("BroadcastNestedLoopJoin") &&
      !pEx.contains("CartesianProduct"), s"non-equi join at x10:\n$pEx")
    graft.engine.Caches.release()
    // CDC chunk stats at x10: same contract.
    val pCdc = plan(Dedup.cdcSharedChunkStats(docs(dir), "doc_id", "text", 16))
    assert(!pCdc.contains("BroadcastNestedLoopJoin") &&
      !pCdc.contains("CartesianProduct"))
    graft.engine.Caches.release()
    // Embedding drift at x10: the histogram join is 2^nBits rows —
    // the PSI tail must still broadcast it, and the 1-row totals ride
    // a broadcast, not a cartesian.
    val pDr = plan(graft.operators.Drift.embeddingDrift(
      emb(dir).filter(col("vec_id") % 2 === 0),
      emb(dir).filter(col("vec_id") % 2 === 1), nBits = 6))
    assert(!pDr.contains("CartesianProduct"), s"cartesian at x10:\n$pDr")
    graft.engine.Caches.release()
  }

  test("x10 fifth-wave plans: line dedup stays equi, method eval never BNLJ") {
    def docs(d: String) = spark.read.parquet(s"$d/documents.parquet")
    // Cross-doc line dedup at x10: the df-count join keys on the md5
    // hash (equi), the reassembly is one doc-keyed agg — no nested
    // loop, no corpus-global window.
    val pLd = plan(Dedup.dropBoilerplateLines(
      docs(dir).select(col("doc_id"),
        Dedup.plantBoilerplate(col("doc_id"), col("text"), 8, 3)
          .as("text")),
      "doc_id", "text", minDf = 10))
    assert(!pLd.contains("BroadcastNestedLoopJoin") &&
      !pLd.contains("CartesianProduct"), s"non-equi join at x10:\n$pLd")
    assert(!pLd.contains("Window"), s"unexpected window at x10:\n$pLd")
    graft.engine.Caches.release()
    // Dedup-method eval at x10: every pair generator is banded/grouped
    // equi. The 1-row truth-count crossJoin legitimately plans as a
    // broadcast nested loop (1 row × methods rows — constant work); the
    // shape that must NEVER appear is an unbroadcast cartesian.
    val pEv = plan(Dedup.dedupMethodEval(docs(dir), "doc_id", "text"))
    assert(!pEv.contains("CartesianProduct"), s"cartesian at x10:\n$pEv")
    graft.engine.Caches.release()
    // Gopher line stats at x10: explode + two hash aggs, no join at all.
    val pGl = plan(graft.operators.CorpusStats.gopherLineStats(
      docs(dir).select(col("doc_id"),
        graft.operators.CorpusStats.gopherLines(col("doc_id"), col("text"),
          8, 5).as("text")), "doc_id", "text"))
    assert(!pGl.contains("Join"), s"unexpected join at x10:\n$pGl")
    graft.engine.Caches.release()
  }
}
