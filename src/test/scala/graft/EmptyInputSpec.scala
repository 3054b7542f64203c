package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, EventAnalytics, QualityReport}

/** Degenerate-input totality: zero-row inputs must yield sane reports,
  * not ANSI division errors — an audit over an empty partition of a
  * 100 TB table is a normal event. */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  test("quality audit over zero rows reports NaN/0 fractions, not errors") {
    val empty = Seq.empty[(Option[Long], String, Double)]
      .toDF("k", "status", "price")
    val rows = QualityReport.audit(empty, Seq(
      QualityReport.completeness("k"),
      QualityReport.uniqueness("k"),
      QualityReport.inRange("price", 0, 100),
      QualityReport.isIn("status", Seq("F")))).collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.isNullAt(1), s"expected NULL frac: $r"))
  }

  test("funnel and retention over zero events emit zero counts") {
    val empty = Seq.empty[(Long, String, java.sql.Timestamp)]
      .toDF("user_id", "event_type", "ts")
    val f = EventAnalytics.funnel(empty).head()
    assert(f.getLong(0) == 0 && f.getLong(1) == 0 && f.getLong(2) == 0)
    assert(EventAnalytics.retention(empty, 7).count() == 0)
  }

  test("repetition metrics and tfidf over zero documents are empty, not errors") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(CorpusStats.repetitionMetrics(empty, "doc_id", "text").count() == 0)
    assert(CorpusStats.tfidfTop1(empty, "doc_id", "text").count() == 0)
    assert(CorpusStats.vocabPrune(empty, "doc_id", "text", 0.5).count() == 0)
  }

  test("PII scrub and decontamination are total on empty inputs") {
    import graft.operators.{Curation, Privacy}
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val docs = Seq((1L, "some perfectly ordinary text")).toDF("doc_id", "text")
    assert(Privacy.scrubPii(empty, "text").count() == 0)
    // Empty eval set: nothing is contaminated, the corpus passes whole.
    assert(Curation.decontaminate(docs, empty, "doc_id", "text").count() == 1)
    // Empty corpus stays empty.
    assert(Curation.decontaminate(empty, docs, "doc_id", "text").count() == 0)
  }

  test("round-9 operators are total on empty and one-sided inputs") {
    import graft.operators.{EventAnalytics, Multimodal, Retrieval, Selection}
    val noDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    val noEmb = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, String, Double)]
      .toDF("event_id", "ts", "event_type", "value")
    assert(Selection.dsirSelect(noDocs, col("lang") === "en", 10).count() == 0)
    // All-target and all-source corpora: the opposite class count is 0
    // everywhere; add-one smoothing must keep every log finite.
    val docs = Seq((0L, "x y", "en"), (1L, "y z", "en")).toDF("doc_id", "text", "lang")
    assert(Selection.dsirSelect(docs, col("lang") === "en", 10).count() == 2)
    assert(Selection.dsirSelect(docs, col("lang") === "fr", 10).count() == 2)
    assert(Retrieval.hybridRrfTopK(noDocs, noEmb).count() == 0)
    assert(Retrieval.hardNegatives(noEmb).count() == 0)
    // Single-label corpus: every candidate shares the query's label —
    // no negatives exist, and that must be an empty result, not an error.
    val oneLabel = Seq((0L, Array(1f, 0f), 7), (1L, Array(0f, 1f), 7))
      .toDF("vec_id", "embedding", "label")
    assert(Retrieval.hardNegatives(oneLabel, nQueries = 1).count() == 0)
    assert(EventAnalytics.ohlcBars(noEvents).count() == 0)
    assert(Multimodal.sampleVideoFrames(spark,
      Multimodal.gifMediaFromDocuments(spark,
        Seq.empty[Long].toDF("doc_id"))).count() == 0)
    graft.engine.Caches.release()
  }

  test("round-11 operators are total on empty and degenerate corpora") {
    import graft.operators.{CorpusStats, ImageDedup}
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // BPE over zero documents (and over a corpus with no alphabetic
    // words): zero merges, empty vocab — never an error or a hang.
    assert(CorpusStats.bpeTrain(noDocs, "text", rounds = 3).count() == 0)
    assert(CorpusStats.bpeVocab(noDocs, "text", rounds = 3).count() == 0)
    val symbolic = Seq((0L, "123 !? 9x9")).toDF("doc_id", "text")
    assert(CorpusStats.bpeTrain(symbolic, "text", rounds = 3).count() == 0)
    // pHash family over zero documents: no media, no pairs, no
    // survivors, no cross matches.
    val noIds = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(ImageDedup.phashNearDup(spark, noIds).count() == 0)
    assert(ImageDedup.phashSurvivors(spark, noIds).count() == 0)
    assert(ImageDedup.phashIncrementalDedup(spark, noIds).count() == 0)
    // An all-corrupt corpus (every id % 37 == 0) quarantines everything:
    // empty pair set, empty survivor set — not a decode error.
    val corrupt = Seq((0L, "x"), (37L, "y")).toDF("doc_id", "text")
    assert(ImageDedup.phashNearDup(spark, corrupt).count() == 0)
    assert(ImageDedup.phashSurvivors(spark, corrupt).count() == 0)
    graft.engine.Caches.release()
  }

  test("excision and bigram-LM operators are total on empty/degenerate corpora") {
    import graft.operators.Dedup
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val docs = Seq(1L -> "some perfectly ordinary text", 2L -> "")
      .toDF("doc_id", "text")
    // Empty corpus: all three emit zero rows, no errors.
    assert(Dedup.exciseBoilerplate(empty, "doc_id", "text", 6, 2).count() == 0)
    assert(Dedup.exciseContaminated(empty, docs, "doc_id", "text", 6).count() == 0)
    assert(CorpusStats.bigramLogProb(empty, docs, "doc_id", "text").count() == 0)
    // Empty eval / reference side: nothing is marked (docs pass through
    // byte-identical), and scoring degrades to the open-vocab floor
    // (V = 1, every pair ln(1/1) = 0) instead of dividing by zero.
    val un = Dedup.exciseContaminated(docs, empty, "doc_id", "text", 6)
      .orderBy("doc_id").collect()
    assert(un.map(_.getString(1)).toSeq ==
      Seq("some perfectly ordinary text", "") &&
      un.forall(_.getLong(2) == 0))
    val floor = CorpusStats.bigramLogProb(docs, empty, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(floor(1L) == 0.0 && floor(2L) == 0.0)
    // Sub-k texts everywhere: no grams, everything survives.
    val tiny = Seq(1L -> "ab", 2L -> "cd").toDF("doc_id", "text")
    assert(Dedup.exciseBoilerplate(tiny, "doc_id", "text", 6, 2)
      .filter(col("n_removed") =!= 0).count() == 0)
    graft.engine.Caches.release()
  }

  test("continuation operators (CDC, copy matrix, metrics, audio, drift) are total on empty inputs") {
    import graft.operators.{Dedup, Drift, Similarity}
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noSrcDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "source", "text")
    val noPairs = Seq.empty[(Long, Long, Double)]
      .toDF("id_a", "id_b", "jaccard")
    val noRank = Seq.empty[(Long, Long, Int)]
      .toDF("query_id", "neighbor_id", "rank")
    val noEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    // Empty corpora: zero rows everywhere, no errors (ANSI division
    // included — every ratio in these operators divides a count that
    // is >= 1 whenever its row exists).
    assert(Dedup.cdcChunks(noDocs, "doc_id", "text", 8).count() == 0)
    assert(Dedup.cdcSharedChunkStats(noDocs, "doc_id", "text", 8).count() == 0)
    assert(Dedup.copyMatrix(noSrcDocs, "doc_id", "source", noPairs).count() == 0)
    assert(Similarity.recallAtK(noRank.drop("rank"), noRank, 5).count() == 0)
    assert(Similarity.mrrAtK(noRank.drop("rank"), noRank).count() == 0)
    assert(graft.operators.Multimodal.audioNearDup(spark, noDocs).count() == 0)
    // Drift of two empty clouds: the outer bin set is empty, PSI
    // summarizes to a zero-bin row with NULL sums (SUM over no rows —
    // the same shape the DuckDB twin emits) rather than erroring.
    val d = Drift.embeddingDrift(noEmb, noEmb, nBits = 3).head()
    assert(d.getLong(1) == 0 && d.isNullAt(2) && d.isNullAt(3))
    graft.engine.Caches.release()
  }

  test("round-14 continuation operators are total on empty inputs") {
    import graft.operators.{Curation, Retrieval, Sampling}
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val docs = Seq((1L, "some perfectly ordinary text")).toDF("doc_id", "text")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    // NFC dedup of nothing is nothing.
    assert(Curation.nfcDedupGroups(noDocs, "doc_id", "text").count() == 0)
    // No near-dup pairs: every doc is a singleton at weight 1.
    val w = Sampling.softDedupWeights(docs, noPairs, "doc_id").collect()
    assert(w.length == 1 && w(0).getLong(1) == 1L && w(0).getDouble(2) == 1.0)
    // Empty corpus with pairs-from-nothing stays empty.
    assert(Sampling.softDedupWeights(noDocs, noPairs, "doc_id").count() == 0)
    // Bloom-pruned decontamination: empty bench keeps the corpus whole
    // (degenerate 1-item filter, nothing matches the empty exact join);
    // empty corpus stays empty.
    assert(Curation.decontaminateBloomPruned(docs, noDocs,
      "doc_id", "text").count() == 1)
    assert(Curation.decontaminateBloomPruned(noDocs, docs,
      "doc_id", "text").count() == 0)
    // BM25 with no query docs (or no docs at all) emits no rows.
    assert(Retrieval.bm25TopK(docs, "doc_id", "text", nQueries = 0).count() == 0)
    assert(Retrieval.bm25TopK(noDocs, "doc_id", "text").count() == 0)
    graft.engine.Caches.release()
  }

  test("fifth-wave operators (q192-q205) are total on empty inputs") {
    import graft.operators.{ChatData, Curation, Dedup, DomainCuration,
      Selection, Similarity, WebText}
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val docs = Seq((1L, "some perfectly ordinary text")).toDF("doc_id", "text")
    assert(CorpusStats.gopherLineStats(noDocs, "doc_id", "text").count() == 0)
    assert(Curation.encodingAudit(noDocs, "doc_id", "text").count() == 0)
    assert(ChatData.validateTranscripts(
      noDocs.withColumnRenamed("text", "transcript"),
      "doc_id", "transcript").count() == 0)
    assert(DomainCuration.canonicalUrlReport(
      noDocs.withColumnRenamed("text", "url"), "doc_id", "url").count() == 0)
    assert(WebText.extractText(
      noDocs.withColumnRenamed("text", "html"), "doc_id", "html").count() == 0)
    assert(Dedup.dropBoilerplateLines(noDocs, "doc_id", "text",
      minDf = 2).count() == 0)
    // Context fit over zero docs: no per-window rows (never a 0/0).
    assert(Curation.contextFitReport(noDocs, "text", Seq(8)).count() == 0)
    // License audit with an empty dimension: everything is 'unknown'.
    val noDim = Seq.empty[(String, String)].toDF("source", "license")
    val audited = DomainCuration.licenseAudit(
      docs.withColumn("source", lit("s")), noDim, "source", "text").collect()
    assert(audited.length == 1 && audited(0).getString(0) == "unknown" &&
      audited(0).getAs[Int]("allowed") == 0)
    // Mixture plan over an empty corpus: every target is unsatisfiable
    // (or trivially satisfied at weight 0), never a division error.
    val plan = Selection.mixturePlan(
      Seq.empty[(String, String)].toDF("lang", "text"), "lang", "text",
      Seq("en" -> 1.0), budget = 100L, maxEpochs = 4).collect()
    assert(plan.length == 1 && plan(0).getAs[Int]("satisfiable") == 0)
    // Embedding QA over zero vectors: one row of zeros, null norms.
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val qa = Similarity.embeddingQa(noVecs, "embedding", 4).head()
    assert(qa.getAs[Long]("n_vecs") == 0L && qa.isNullAt(4))
    assert(CorpusStats.charEntropy(noDocs, "doc_id", "text", 2.0)
      .count() == 0)
    // Dedup-method eval on a dup-free corpus: zero truth, zero division.
    val distinctDocs = Seq((1L, "alpha beta gamma delta"),
      (2L, "one two three four")).toDF("doc_id", "text")
    val ev = Dedup.dedupMethodEval(distinctDocs, "doc_id", "text")
      .collect()
    assert(ev.forall(_.getAs[Double]("recall") == 0.0) &&
      ev.forall(_.getAs[Double]("f1") == 0.0))
    graft.engine.Caches.release()
  }
}
