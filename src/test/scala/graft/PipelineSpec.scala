package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{Curation, Pipeline}

/** q209 — the end-to-end curation DAG: the composed report's per-stage
  * numbers must equal the standalone operators run on the same inputs
  * (drop counts = the standalone funnel's), and the whole report must
  * be conservation-consistent stage to stage. */
class PipelineSpec extends SparkSpec {

  test("pipeline funnel drops equal the standalone filterFunnel; report conserves") {
    val docs = Tables.documents(spark, sf)
    val report = Pipeline.fullCuration(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    graft.engine.Caches.release()

    // The standalone funnel over exactly the pipeline's gated corpus
    // must reproduce the composed report's per-gate drop counts.
    val funnel = Curation.filterFunnel(
      Pipeline.gatedCorpus(docs, minEntropy = 2.0),
      Pipeline.gateColumns(col("text"), minTokens = 10, minQuality = 0.3))
      .collect()
    graft.engine.Caches.release()
    funnel.foreach { r =>
      val key = f"1${r.getInt(0)}%02d_drop_${r.getString(1)}"
      assert(report(key) == r.getLong(3).toDouble,
        s"composed vs standalone drop count diverged at ${r.getString(1)}")
    }

    // Conservation across the report: every stage's out = next stage's
    // in, so a stage silently losing or duplicating documents cannot
    // produce a consistent table.
    val gateDrops = funnel.map(_.getLong(3)).sum.toDouble
    assert(report("000_input_docs") - gateDrops ==
      report("190_gate_survivors"))
    assert(report("190_gate_survivors") - report("200_dedup_victims") ==
      report("210_dedup_survivors"))
    assert(report("300_classifier_rejected") +
      report("310_classifier_kept") == report("210_dedup_survivors"))
    assert(report("400_budget_docs") <= report("310_classifier_kept"))
    assert(report("410_budget_tokens") <= 20000.0,
      "budget stage must respect the token budget")
    // Packing and card both describe the SAME released corpus.
    assert(report("600_card_n_docs") == report("400_budget_docs"))
    assert(report("510_packed_tokens") == report("600_card_total_tokens"))
    assert(report("500_packed_sequences") >= 1.0 ||
      report("400_budget_docs") == 0.0)
    // The harness plants guarantee real drops on this corpus.
    assert(report("100_drop_encoding_clean") > 0)
    assert(report("101_drop_safety") > 0)
  }

  test("incremental pipeline: stored-reference stage rows are additive across batches") {
    val docs = Tables.documents(spark, sf)
    // The four stored artifacts the daily loop reads — built once via
    // the same fixtures the q214 registration uses.
    val lineIdx = SparkEntry.storedDedupIndex(spark, sf, "linedf")
    val mhIdx = SparkEntry.storedDedupIndex(spark, sf, "minhash")
    val qm = SparkEntry.storedQualityModel(spark, sf)
    val bpe = SparkEntry.storedBpeModel(spark, sf)
    graft.engine.Caches.release()
    def run(pred: org.apache.spark.sql.Column): Map[String, Double] = {
      val batch = docs.filter(pred)
        .select(col("doc_id"), col("lang"),
          graft.operators.Dedup.plantBoilerplate(col("doc_id"),
            col("text"), lineLen = 8, mod = 2).as("text"))
      val r = Pipeline.incrementalCuration(batch, lineIdx, mhIdx, qm, bpe)
        .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
      graft.engine.Caches.release()
      r
    }
    val inBatch = col("doc_id") % 3 =!= 0
    val a = run(inBatch && col("doc_id") % 2 === 0)
    val b = run(inBatch && col("doc_id") % 2 === 1)
    val u = run(inBatch)
    // Stages 1-5 are per-document against FROZEN stored state, so their
    // rows are additive: report(A) + report(B) == report(A ∪ B) —
    // the q148/q207 stored-reference contract lifted to the chain. The
    // select/pack/card tail (metric keys >= "400") is globally ordered
    // and deliberately excluded.
    val additive = u.keySet.filter(_ < "400")
    assert(additive.exists(_.startsWith("1")), "funnel rows present")
    additive.foreach { k =>
      assert(a.getOrElse(k, 0.0) + b.getOrElse(k, 0.0) == u(k),
        s"$k not additive: ${a.getOrElse(k, 0.0)} + " +
          s"${b.getOrElse(k, 0.0)} != ${u(k)}")
    }
    // The stored-reference stages do real work on this corpus.
    assert(u("050_line_lines_dropped") > 0, "line cleanse must fire")
    assert(u("200_history_dup_docs") > 0, "history dedup must fire")
    assert(u("350_stored_bpe_words") > 0, "stored tokenizer must price")
    // Conservation within one run.
    assert(u("190_gate_survivors") - u("200_history_dup_docs") ==
      u("210_novel_docs"))
    assert(u("300_classifier_rejected") + u("310_classifier_kept") ==
      u("210_novel_docs"))
    // Stage-timing telemetry: the last run left one wall clock per
    // stage, in stage order (the diagnostic channel bench reads — NOT
    // rows of the oracled report, which stays hash-comparable).
    val stages = Pipeline.lastStageSeconds
    assert(stages.map(_._1) == Seq("1_line_cleanse", "2_extract_gate",
      "3_survivors", "4_history_dedup", "5_novel", "6_classify",
      "7_classifier_keep", "8_bpe_price", "9_budget", "10_final_select",
      "11_pack"), s"unexpected stage set: $stages")
    assert(stages.forall(_._2 >= 0.0))
    assert(Pipeline.stageTimingReport(spark).count() == stages.size)
  }
}
