package graft

import org.apache.spark.sql.DataFrame

import graft.engine.Manifests
import graft.operators.Dedup
import graft.streaming.IncrementalIngest

/** The versioned-manifest protocol on the MinHash index family:
  * snapshot isolation for readers across append and compaction, the
  * GC keep horizon, malformed-stray tolerance, and orphan reclaim —
  * the EventStream upsert-table guarantees lifted to a stored
  * artifact. */
class ManifestsSpec extends SparkSpec {

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("minhash index: reader snapshots survive append and compaction; GC sweeps the horizon") {
    val dir = s"${graft.engine.Sinks.scratch}/manifests_minhash"
    IncrementalIngest.deleteDir(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    Dedup.buildMinhashIndex(
      df(1L -> "alpha beta gamma delta epsilon zeta eta theta"),
      dir, "doc_id", "text", n = 3, numHashes = 64, bands = 32)
    assert(Manifests.liveVersion(spark, dir).contains(1L))
    // A reader resolves ONCE; everything below must not disturb it.
    val snap1 = Manifests.snapshot(spark, dir).get
    assert(snap1.version == 1L)
    val idsV1 = snap1.read(spark, "sh").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(idsV1 == Set(1L))

    // A malformed MANIFEST-prefixed stray must be tolerated by BOTH
    // resolution and the GC sweep inside the next commits.
    fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/MANIFEST-not-a-number"), true).close()
    // And an unreferenced stray segment (a crashed commit's orphan)
    // must be reclaimed by the next commit's list-based GC.
    df(99L -> "orphan content").write.mode("overwrite")
      .parquet(s"${Manifests.segDir(dir, 42L)}/sh")

    Dedup.appendToMinhashIndex(
      df(2L -> "one two three four five six seven eight"),
      dir, "doc_id", "text")
    assert(Manifests.liveVersion(spark, dir).contains(2L))
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/MANIFEST-not-a-number")),
      "GC must tolerate (and not delete) a malformed marker stray")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      Manifests.segDir(dir, 42L))),
      "an unreferenced orphan segment must be reclaimed")
    // keepVersions = 2: the v1 snapshot resolved before the append is
    // still fully readable — the commit touched nothing it references.
    assert(snap1.read(spark, "sh").select("id")
      .collect().map(_.getLong(0)).toSet == idsV1,
      "a resolved snapshot must be immutable under an append")
    val snap2 = Manifests.snapshot(spark, dir).get
    assert(snap2.read(spark, "sh").count() == 2L)
    assert(snap2.tables("sh").size == 2, "append adds a segment, not a rewrite")

    graft.engine.Caches.release()
    Dedup.compactMinhashIndex(spark, dir)
    assert(Manifests.liveVersion(spark, dir).contains(3L))
    // snap2 (v2) is inside the keep horizon {v2, v3}: still readable.
    assert(snap2.read(spark, "sh").count() == 2L,
      "a snapshot inside the keep horizon must survive compaction")
    val snap3 = Manifests.snapshot(spark, dir).get
    assert(snap3.tables("sh").size == 1, "compaction re-bases to one segment")
    assert(snap3.read(spark, "sh").count() == 2L)

    // One more commit ages v2 out: its exclusive segments (seg1, seg2)
    // are no longer referenced by any kept manifest and must be swept,
    // while the compacted segment stays.
    Dedup.appendToMinhashIndex(
      df(3L -> "red orange yellow green blue indigo violet pink"),
      dir, "doc_id", "text")
    assert(Manifests.liveVersion(spark, dir).contains(4L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      Manifests.segDir(dir, 1L))), "aged-out segment must be GC'd")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      Manifests.segDir(dir, 2L))), "aged-out segment must be GC'd")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      Manifests.segDir(dir, 3L))), "referenced segment must survive GC")
    assert(Manifests.snapshot(spark, dir).get.read(spark, "sh")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))

    // Replay safety: re-appending an already-indexed batch publishes
    // nothing (the anti-join short-circuit) — version unchanged.
    Dedup.appendToMinhashIndex(
      df(3L -> "red orange yellow green blue indigo violet pink"),
      dir, "doc_id", "text")
    assert(Manifests.liveVersion(spark, dir).contains(4L),
      "a fully-replayed append must not publish a new version")
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$dir/MANIFEST-not-a-number"), false)
    graft.engine.Caches.release()
  }

  test("time travel: a pinned published version answers as of then; aged versions refuse") {
    val dir = s"${graft.engine.Sinks.scratch}/manifests_timetravel"
    IncrementalIngest.deleteDir(spark, dir)
    Dedup.buildMinhashIndex(
      df(1L -> "alpha beta gamma delta epsilon zeta eta theta"),
      dir, "doc_id", "text", n = 3, numHashes = 64, bands = 32)
    Dedup.appendToMinhashIndex(
      df(2L -> "one two three four five six seven eight"),
      dir, "doc_id", "text")
    val probe = df(
      101L -> "alpha beta gamma delta epsilon zeta eta zzz",
      102L -> "one two three four five six seven zzz")
    def ids(atVersion: Option[Long]) =
      Dedup.minhashNearDupFromIndex(probe, dir, "doc_id", "text", 0.5,
          atVersion = atVersion)
        .orderBy("new_id").collect().map(_.getLong(1)).toSeq
    // Live sees both reference docs; VERSION AS OF 1 sees only doc 1.
    assert(ids(None) == Seq(1L, 2L))
    assert(ids(Some(1L)) == Seq(1L),
      "version 1 must answer with the pre-append state")
    assert(Manifests.snapshotAt(spark, dir, 3L).isEmpty,
      "an unpublished version must not resolve")
    // Age version 1 past the keep horizon (keepVersions = 2): after
    // one more commit it must refuse rather than serve a swept mix.
    Dedup.appendToMinhashIndex(
      df(3L -> "red orange yellow green blue indigo violet pink"),
      dir, "doc_id", "text")
    assert(Manifests.snapshotAt(spark, dir, 1L).isEmpty,
      "a version aged past the keep horizon must not resolve")
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashNearDupFromIndex(probe, dir, "doc_id", "text", 0.5,
        atVersion = Some(1L)).collect()
    }
    assert(e.getMessage.contains("keep horizon"))
    graft.engine.Caches.release()
  }

  test("time travel generalizes: a pinned model version scores as of then") {
    import spark.implicits._
    val dir = s"${graft.engine.Sinks.scratch}/manifests_model_tt"
    IncrementalIngest.deleteDir(spark, dir)
    val trainA = Seq((1L, "good fine nice", true), (2L, "bad awful", false))
      .toDF("doc_id", "text", "y")
    val trainB = Seq((3L, "splendid good", true), (4L, "horrid bad", false))
      .toDF("doc_id", "text", "y")
    val eval = Seq((10L, "good splendid"), (11L, "bad horrid"))
      .toDF("doc_id", "text")
    graft.operators.QualityClassifier.saveModel(trainA, "text", "y", dir)
    def scores(atVersion: Option[Long]) =
      graft.operators.QualityClassifier.scoreFromModel(
          eval, dir, "doc_id", "text", atVersion)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val before = scores(None)
    graft.operators.QualityClassifier.appendToModel(trainB, "text", "y", dir)
    assert(scores(Some(1L)) == before,
      "version 1 must score with the pre-append weights")
    assert(scores(None) != before,
      "the live model must reflect the appended labels")
    graft.engine.Caches.release()
  }

  test("minhash index: queries read one snapshot — results stable across a mid-flight commit") {
    val dir = s"${graft.engine.Sinks.scratch}/manifests_minhash_iso"
    IncrementalIngest.deleteDir(spark, dir)
    Dedup.buildMinhashIndex(
      df(1L -> "alpha beta gamma delta epsilon zeta eta theta"),
      dir, "doc_id", "text", n = 3, numHashes = 64, bands = 32)
    val probe = df(101L -> "alpha beta gamma delta epsilon zeta eta zzz")
    // Resolve the query's plan (and with it the snapshot) BEFORE the
    // append commits, execute AFTER: the result must reflect the
    // resolved version, not a torn mix.
    val q = Dedup.minhashNearDupFromIndex(probe, dir, "doc_id", "text", 0.5)
    Dedup.appendToMinhashIndex(
      df(2L -> "alpha beta gamma delta epsilon zeta eta yyy"),
      dir, "doc_id", "text")
    val got = q.orderBy("new_id", "ref_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((101L, 1L)),
      s"pre-commit snapshot must not see the appended doc: $got")
    // A fresh resolution sees both reference docs.
    val after = Dedup.minhashNearDupFromIndex(probe, dir,
      "doc_id", "text", 0.5).orderBy("new_id", "ref_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(after == Seq((101L, 1L), (101L, 2L)))
    graft.engine.Caches.release()
  }
}
