package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.Sampling

/** Deterministic-sampling semantics: hash equivalence with the native
  * kernel, leakage-proofness, partition invariance, and rate sanity. */
class SamplingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  test("contentHash64 (built-in composition) == md5First8LE kernel value") {
    import org.apache.spark.unsafe.types.UTF8String
    val rows = docs.select(col("text"),
      Sampling.contentHash64(col("text")).as("h")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val want = graft.functions.TextKernels.md5First8LE(
        UTF8String.fromString(r.getString(0)).getBytes, 0,
        UTF8String.fromString(r.getString(0)).numBytes())
      assert(r.getLong(1) == want)
    }
  }

  test("identical texts always land in the same split (leakage-proof)") {
    import spark.implicits._
    // Duplicate every document under fresh ids: each text's split set
    // must be a singleton no matter how many copies exist.
    val doubled = docs.select(col("doc_id"), col("text"))
      .union(docs.select(col("doc_id") + 1000000L, col("text")))
    val perText = Sampling.assignSplits(doubled.toDF(), "text")
      .groupBy("text").agg(countDistinct("split").as("n_splits"))
    assert(perText.filter(col("n_splits") =!= 1).count() == 0)
  }

  test("assignment is partition-invariant (rand/sample is not)") {
    val a = Sampling.assignSplits(docs, "text")
      .select("doc_id", "bucket", "split")
    val b = Sampling.assignSplits(docs.repartition(17), "text")
      .select("doc_id", "bucket", "split")
    assert(a.except(b).count() == 0)
    assert(b.except(a).count() == 0)
  }

  test("split rates track the bucket thresholds") {
    val counts = Sampling.assignSplits(docs, "text")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    // 80/10/10 thresholds; tolerance generous for a 500-doc corpus with
    // duplicated texts (the hash is per-text, not per-row).
    assert(math.abs(counts.getOrElse("train", 0L) / total - 0.8) < 0.1)
    assert(counts.getOrElse("val", 0L) > 0 || counts.getOrElse("test", 0L) > 0)
  }

  test("sampleByContent keeps exactly the below-cut buckets") {
    val kept = Sampling.sampleByContent(docs, "text", keepBuckets = 512)
    val check = Sampling.assignSplits(docs, "text")
    val wantCount = check.filter(col("bucket") < 512).count()
    assert(kept.count() == wantCount)
    assert(kept.count() > 0)
  }

  test("quota sample takes min(quota, stratum size) per stratum, reproducibly") {
    val quota = 7
    val sampled = Sampling.quotaSample(docs, "lang", "text", quota).cache()
    val sizes = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(got(lang) == math.min(quota.toLong, n),
        s"stratum $lang: got ${got(lang)} of $n (quota $quota)")
    }
    // Content-keyed ⇒ the same rows every time.
    val again = Sampling.quotaSample(docs, "lang", "text", quota)
    assert(sampled.exceptAll(again).count() == 0)
    assert(again.exceptAll(sampled).count() == 0)
  }

  test("temperature mix upsamples tail languages and respects per-language budgets") {
    import graft.functions.TextFunctions
    import graft.operators.Sampling
    val docs = graft.engine.Tables.documents(spark, sf)
    val base = docs.select(
      TextFunctions.langId(col("text")).as("lang"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val raw = base.groupBy("lang").agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(raw.size >= 2, "fixture needs >= 2 languages")
    val picked = Sampling
      .temperatureMixSample(docs, "doc_id", "text", totalTokens = 20000L)
    val sel = picked.groupBy("lang").agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rawTotal = raw.values.sum.toDouble
    val selTotal = sel.values.sum.toDouble
    // sqrt-mix property: the smallest language's share of the SAMPLE
    // strictly exceeds its share of the raw corpus.
    val tail = raw.minBy(_._2)._1
    assert(sel(tail) / selTotal > raw(tail) / rawTotal,
      s"tail lang $tail not upsampled: sel=$sel raw=$raw")
    // Budgets: per-language selected tokens stay within the sqrt budget.
    val wRaw = raw.map { case (l, t) => l -> math.sqrt(t.toDouble) }
    val wSum = wRaw.values.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    wRaw.foreach { case (l, w) =>
      assert(sel.getOrElse(l, 0L).toDouble <= w / wSum * 20000L,
        s"lang $l exceeded its budget")
    }
    // Deterministic: a second run selects exactly the same documents.
    val again = Sampling
      .temperatureMixSample(docs, "doc_id", "text", totalTokens = 20000L)
    assert(picked.exceptAll(again).count() == 0)
    assert(again.exceptAll(picked).count() == 0)
  }

  test("approxGroupCount: estimates within 15% of exact, bit-deterministic") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val key = concat_ws("-", col("l_orderkey"), col("l_linenumber"))
    def run() = Sampling.approxGroupCount(li, key,
        Seq(month(col("l_shipdate")).cast("int").as("month")),
        keepBuckets = 128)
      .as[(Int, Long, Long)].collect()
      .map { case (m, s, e) => m -> (s, e) }.toMap
    val est = run()
    assert(est == run(), "hash-keyed sample must be exactly reproducible")
    val exact = li.groupBy(month(col("l_shipdate")).cast("int").as("month"))
      .count().as[(Int, Long)].collect().toMap
    // Error bounds sized to the fixture: ~470 rows/month at sf0.001, so a
    // 1/8 sample holds ~60 rows → ~12% stderr per month (50% is >4σ);
    // the TOTAL pools ~6k rows → ~3% stderr (10% is >3σ).
    exact.foreach { case (m, n) =>
      val e = est(m)._2.toDouble
      assert(math.abs(e - n) / n <= 0.5,
        s"month $m: estimate $e vs exact $n off by ${(e - n) / n}")
    }
    val totalExact = exact.values.sum.toDouble
    val totalEst = est.values.map(_._2).sum.toDouble
    assert(math.abs(totalEst - totalExact) / totalExact <= 0.10,
      s"total estimate $totalEst vs exact $totalExact")
    // n_est is the exact integer scale-up of the sampled count.
    est.values.foreach { case (s, e) => assert(e == s * 8) }
  }

  test("keySkew: shares sum to <=1 over topN, skew factors exact") {
    import spark.implicits._
    val got = graft.operators.Profiling.keySkew(
      Tables.orders(spark, sf), "o_custkey", topN = 10)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length == 10)
    // Ordered by count desc; each skew factor is cnt·nKeys/total exactly.
    assert(got.sliding(2).forall(p => p(0)._2 >= p(1)._2))
    val counts = Tables.orders(spark, sf).groupBy("o_custkey").count()
      .as[(Long, Long)].collect().toMap
    val total = counts.values.sum.toDouble
    val nKeys = counts.size.toLong
    got.foreach { case (k, cnt, share, skew) =>
      assert(cnt == counts(k))
      assert(share == cnt / total)
      assert(skew == (cnt * nKeys) / total)
    }
  }

  test("cluster-safe splits: members take the representative's split, singletons their own") {
    import spark.implicits._
    import graft.operators.{Dedup, Sampling}
    // Docs 1/2 are near-dups (one word changed), 3/4 are singletons.
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      1L -> base,
      2L -> base.replace("lazy", "sleepy"),
      3L -> "a completely unrelated first document",
      4L -> "and another unrelated one").toDF("doc_id", "text")
    val clusters = Dedup.dedupClusters(
      Dedup.minhashNearDup(docs, "doc_id", "text",
        n = 3, numHashes = 64, bands = 16, threshold = 0.5))
    val out = Sampling.clusterSafeSplits(docs, "doc_id", "text", clusters)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    val naive = Sampling.assignSplits(docs, "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bucket"), r.getAs[String]("split"))).toMap
    // Every input doc is covered; the near-dup pair shares cluster 1
    // and doc 1's OWN bucket/split (the representative's), regardless
    // of where doc 2's text would hash on its own.
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((1L, naive(1L)._1, naive(1L)._2)))
    assert(out(2L) == ((1L, naive(1L)._1, naive(1L)._2)))
    // The guarantee is vacuous if the twins' own hashes agree anyway —
    // this fixture's do not (checked here so a testdata-era hash change
    // that collapses them fails loudly instead of weakening the test).
    assert(naive(2L)._1 != naive(1L)._1,
      "fixture twins hash to the same bucket; pick a different mutation")
    // Singletons are their own representative: identical to assignSplits.
    assert(out(3L) == ((3L, naive(3L)._1, naive(3L)._2)))
    assert(out(4L) == ((4L, naive(4L)._1, naive(4L)._2)))
    graft.engine.Caches.release()
  }

  test("topQuantileByScore: ceil per stratum, ties on id, never empties a stratum") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // en: 5 docs (25% -> ceil(1.25) = 2 kept); de: 1 doc (always kept);
    // ties: docs 3 and 4 share a score — lower id wins the last slot.
    val scored = Seq(
      (1L, "en", 0.9), (2L, "en", 0.5), (3L, "en", 0.5),
      (4L, "en", 0.1), (5L, "en", 0.0),
      (9L, "de", -2.0))
      .toDF("doc_id", "lang", "score")
    val kept = graft.operators.Sampling.topQuantileByScore(
        scored, "lang", "score", "doc_id", q = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 9L),
      "en keeps ceil(5*0.25)=2 best (tie 2-vs-3 broken by id); de keeps its 1")
    assertThrows[IllegalArgumentException] {
      graft.operators.Sampling.topQuantileByScore(
        scored, "lang", "score", "doc_id", q = 0.0)
    }
  }

  test("softDedupWeights: 1/cluster-size, singletons 1, constant content mass") {
    import spark.implicits._
    val corpus = (1L to 6L).map(i => (i, s"doc number $i"))
      .toDF("doc_id", "text")
    // Planted near-dup graph: {1,2,3} via a chain, {4,5}; 6 singleton.
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Sampling.softDedupWeights(corpus, pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    Seq(1L, 2L, 3L).foreach(i => assert(out(i) == ((3L, 0.333333))))
    Seq(4L, 5L).foreach(i => assert(out(i) == ((2L, 0.5))))
    assert(out(6L) == ((1L, 1.0)))
    // Soft dedup's invariant: each piece of content carries total
    // weight ~1, so Σ weights == #content groups (3), mod rounding.
    val total = out.values.map(_._2).sum
    assert(math.abs(total - 3.0) < 1e-4, s"content mass drifted: $total")
    // And that equals what HARD dedup would keep (the survivors), so
    // the two strategies agree on effective corpus size.
    val survivors = graft.operators.Dedup.survivors(corpus, "doc_id",
      graft.operators.Dedup.dedupClusters(pairs)).count()
    assert(math.round(total) == survivors)
    graft.engine.Caches.release()
  }

  test("effectiveCorpusSize: raw vs weighted volumes reconcile per language") {
    import spark.implicits._
    // en: docs 1-3 one cluster (2 tokens each) + singleton 6 (3 tokens);
    // de: pair {4,5} (1 token each).
    val corpus = Seq(
      (1L, "a b", "en"), (2L, "a b", "en"), (3L, "a b", "en"),
      (4L, "x", "de"), (5L, "x", "de"), (6L, "p q r", "en"))
      .toDF("doc_id", "text", "lang")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Sampling.effectiveCorpusSize(corpus, pairs,
        "doc_id", "text", "lang")
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // en: 4 raw docs / 9 raw tokens; effective docs = 3·(1/3) + 1 = 2,
    // effective tokens = 3·(2·1/3) + 3 = 5 (mod 6-dp weight rounding).
    // de: 2 raw docs / 2 raw tokens; effective = 1 doc, 1 token.
    val Seq(de, en) = out.toSeq
    assert(de == (("de", 2L, 2L, 1.0, 1.0)))
    assert(en._2 == 4L && en._3 == 9L)
    assert(math.abs(en._4 - 2.0) < 1e-4 && math.abs(en._5 - 5.0) < 1e-4)
    graft.engine.Caches.release()
  }
}
