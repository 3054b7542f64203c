package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.{IncrementalIngest, StreamingDedup}

/** The streamed production ingest-dedup loop over a persisted MinHash
  * index: batch-internal collapse, cross-check against stored state,
  * index GROWTH (batch 2 must reject near-dups of what batch 1
  * accepted), quarantine provenance, and streaming == batch-twin
  * equivalence on identical arrivals. */
class StreamingDedupSpec extends SparkSpec {

  // 8 words → six 3-gram shingles; changing the LAST word changes one
  // shingle → J = 5/7 ≈ 0.71 ≥ 0.5 (a near-dup at the gate threshold).
  // Distinct docs share no words → J = 0.
  private val ref1 = "alpha beta gamma delta epsilon zeta eta theta"
  private val ref2 = "one two three four five six seven eight"
  private val novelA = "red orange yellow green blue indigo violet pink"
  private val novelB = "cat dog fox wolf bear lion tiger puma"
  private val novelC = "ruby python scala java rust go swift kotlin"
  private def variant(t: String) = t.split(" ").dropRight(1).mkString(" ") + " zzz"

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val batch1 = Seq(
    101L -> variant(ref1), // ref_dup of stored doc 1
    102L -> novelA,
    103L -> novelB,
    104L -> variant(novelB)) // batch_dup, collapses into 103
  private val batch2 = Seq(
    201L -> variant(novelA), // ref_dup of 102 — only if the index GREW
    202L -> novelC)

  private def buildRefIndex(dir: String): Unit = {
    IncrementalIngest.deleteDir(spark, dir)
    Dedup.buildMinhashIndex(df(1L -> ref1, 2L -> ref2), dir,
      "doc_id", "text", n = 3, numHashes = 64, bands = 32)
  }

  private def acceptedIds(dir: String): Set[Long] =
    spark.read.parquet(dir).select("doc_id").collect()
      .map(_.getLong(0)).toSet

  private def rejected(dir: String): Map[Long, (Long, String)] =
    spark.read.parquet(dir)
      .select("doc_id", "matched_id", "reason").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  test("streamed dedup loop: batch collapse, stored-state rejects, index growth, provenance") {
    val root = s"${graft.engine.Sinks.scratch}/streaming_dedup_spec"
    val (src, acc, rej, cp, idx) = (s"$root/src", s"$root/accepted",
      s"$root/rejected", s"$root/cp", s"$root/index")
    Seq(src, acc, rej, cp).foreach(IncrementalIngest.deleteDir(spark, _))
    buildRefIndex(idx)
    // No index → the stream refuses to start (a silently un-deduped
    // corpus is the failure this guards).
    assertThrows[IllegalArgumentException] {
      StreamingDedup.runAvailable(spark, src, df(1L -> ref1).schema,
        s"$root/no_such_index", acc, rej, cp)
    }
    // Arrival 1 drains batch1; arrival 2 (same checkpoint) ONLY batch2.
    df(batch1: _*).write.mode("append").parquet(src)
    StreamingDedup.runAvailable(spark, src, df(1L -> ref1).schema,
      idx, acc, rej, cp)
    df(batch2: _*).write.mode("append").parquet(src)
    StreamingDedup.runAvailable(spark, src, df(1L -> ref1).schema,
      idx, acc, rej, cp)

    assert(acceptedIds(acc) == Set(102L, 103L, 202L))
    val r = rejected(rej)
    assert(r(101L) == ((1L, "ref_dup")), "variant of stored ref1")
    assert(r(104L) == ((103L, "batch_dup")), "collapsed into same-batch 103")
    // The growth proof: 201 matches 102, which was never in the BUILT
    // index — it got there only because batch 1's accept appended it.
    assert(r(201L) == ((102L, "ref_dup")))
    assert(r.keySet == Set(101L, 104L, 201L))
    // The index now holds reference + everything accepted.
    val indexed = spark.read.parquet(s"$idx/sh").select("id").collect()
      .map(_.getLong(0)).toSet
    assert(indexed == Set(1L, 2L, 102L, 103L, 202L))
    assert(Dedup.minhashIndexExists(spark, idx), "marker re-committed")
  }

  test("streaming path equals the batch twin on identical arrivals") {
    val root = s"${graft.engine.Sinks.scratch}/streaming_dedup_twin"
    val (acc, rej, idx) = (s"$root/accepted", s"$root/rejected", s"$root/index")
    Seq(acc, rej).foreach(IncrementalIngest.deleteDir(spark, _))
    buildRefIndex(idx)
    StreamingDedup.dedupBatch(df(batch1: _*), idx, acc, rej, threshold = 0.5)
    StreamingDedup.dedupBatch(df(batch2: _*), idx, acc, rej, threshold = 0.5)
    assert(acceptedIds(acc) == Set(102L, 103L, 202L))
    assert(rejected(rej) == Map(
      101L -> ((1L, "ref_dup")),
      104L -> ((103L, "batch_dup")),
      201L -> ((102L, "ref_dup"))))
  }
}
