package graft

import graft.engine.{Manifests, RunLedger}
import graft.streaming.IncrementalIngest

/** The run-level manifest's own mechanics: atomic record/resolve,
  * unique run ids, the crash contract (an incomplete run is never
  * resolvable), and the audit relation. The pipeline-shaped
  * record→replay equivalence lives in PipelineSpec. */
class RunLedgerSpec extends SparkSpec {

  private def pin(store: String, v: Long) =
    RunLedger.Pin(store, s"/stores/$store", v)

  test("record/resolve roundtrip; unknown and crashed runs never resolve; run ids are unique") {
    val dir = s"${graft.engine.Sinks.scratch}/run_ledger_spec"
    IncrementalIngest.deleteDir(spark, dir)
    assert(RunLedger.resolve(spark, dir, "day1").isEmpty,
      "an unbuilt ledger resolves nothing")
    assert(RunLedger.runHistory(spark, dir).count() == 0L)

    RunLedger.commit(spark, dir, "day1",
      Seq(pin("line_df", 1L), pin("minhash", 1L)))
    assert(RunLedger.resolve(spark, dir, "day1").contains(
      Map("line_df" -> 1L, "minhash" -> 1L)))
    assert(RunLedger.resolve(spark, dir, "day2").isEmpty,
      "a run that never committed must not resolve")

    // Day 2 reads newer store versions; both runs stay resolvable and
    // the audit relation holds one row per (run, store).
    RunLedger.commit(spark, dir, "day2",
      Seq(pin("line_df", 2L), pin("minhash", 1L)))
    assert(RunLedger.resolve(spark, dir, "day1").contains(
      Map("line_df" -> 1L, "minhash" -> 1L)),
      "recording a later run must not disturb an earlier one")
    assert(RunLedger.resolve(spark, dir, "day2").contains(
      Map("line_df" -> 2L, "minhash" -> 1L)))
    val hist = RunLedger.runHistory(spark, dir)
      .orderBy("run_id", "store").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3))).toSeq
    assert(hist == Seq(("day1", "line_df", 1L), ("day1", "minhash", 1L),
      ("day2", "line_df", 2L), ("day2", "minhash", 1L)),
      s"audit relation mismatch: $hist")
    // Ledger commits are tagged with the run id (Manifests.history
    // composes with the pins for free).
    assert(Manifests.commitMeta(spark, dir, 1L).get("tag").contains("day1"))

    // Run ids name runs uniquely — a replay must not overwrite the
    // original audit trail.
    val e = intercept[IllegalArgumentException] {
      RunLedger.commit(spark, dir, "day1", Seq(pin("line_df", 9L)))
    }
    assert(e.getMessage.contains("already recorded"))

    // Ill-formed runs refuse loudly.
    intercept[IllegalArgumentException] {
      RunLedger.commit(spark, dir, "bad\tid", Seq(pin("s", 1L)))
    }
    intercept[IllegalArgumentException] {
      RunLedger.commit(spark, dir, "day3", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      RunLedger.commit(spark, dir, "day3",
        Seq(pin("line_df", 1L), pin("line_df", 2L)))
    }
  }

  test("compact folds the pins into one segment; resolution and history unchanged; appends continue") {
    val dir = s"${graft.engine.Sinks.scratch}/run_ledger_compact"
    IncrementalIngest.deleteDir(spark, dir)
    RunLedger.commit(spark, dir, "day1", Seq(pin("line_df", 1L)))
    RunLedger.commit(spark, dir, "day2", Seq(pin("line_df", 2L)))
    RunLedger.commit(spark, dir, "day3", Seq(pin("line_df", 3L)))
    val before = RunLedger.runHistory(spark, dir)
      .orderBy("run_id").collect().map(_.toString).toSeq
    assert(Manifests.snapshot(spark, dir).get.tables("pins").size == 3,
      "append-style commits carry one segment per run")
    RunLedger.compact(spark, dir)
    assert(Manifests.snapshot(spark, dir).get.tables("pins").size == 1,
      "compaction re-bases the pins to one segment")
    assert(RunLedger.runHistory(spark, dir)
      .orderBy("run_id").collect().map(_.toString).toSeq == before,
      "the pins relation must be unchanged by compaction")
    assert(RunLedger.resolve(spark, dir, "day2").contains(
      Map("line_df" -> 2L)))
    // Post-compact commits append from the compacted base, and the
    // duplicate guard still sees folded runs.
    RunLedger.commit(spark, dir, "day4", Seq(pin("line_df", 4L)))
    assert(Manifests.snapshot(spark, dir).get.tables("pins").size == 2)
    assert(RunLedger.resolve(spark, dir, "day1").contains(
      Map("line_df" -> 1L)))
    intercept[IllegalArgumentException] {
      RunLedger.commit(spark, dir, "day2", Seq(pin("line_df", 9L)))
    }
  }

  test("crash contract: a run that dies before its ledger commit is invisible — no partial pins ever resolve") {
    val dir = s"${graft.engine.Sinks.scratch}/run_ledger_crash"
    IncrementalIngest.deleteDir(spark, dir)
    RunLedger.commit(spark, dir, "day1", Seq(pin("line_df", 1L)))
    // A "run" is per-store appends + work + ONE ledger commit at the
    // end. Simulate the crash window: the run's store commits happened
    // (out of frame here) but the process died before RunLedger.commit
    // — the ledger must show nothing for it, and later runs must be
    // unaffected. (There is no partial state to clean: the ledger
    // commit is the only ledger write a run performs, and it is itself
    // atomic via Manifests.publish.)
    assert(RunLedger.resolve(spark, dir, "day2-crashed").isEmpty)
    RunLedger.commit(spark, dir, "day3", Seq(pin("line_df", 3L)))
    assert(RunLedger.resolve(spark, dir, "day3").contains(
      Map("line_df" -> 3L)))
    assert(RunLedger.resolve(spark, dir, "day2-crashed").isEmpty,
      "a crashed run must stay unresolvable forever")
    // And a crash INSIDE the ledger commit itself (mid-publish) is the
    // Manifests crash story: no marker → no version → not resolvable.
    // Plant the torn shape a pre-marker death leaves (orphan segment,
    // no marker): resolution must not see it.
    import spark.implicits._
    Seq(("ghost", "s", "/d", 9L)).toDF("run_id", "store", "dir", "version")
      .write.parquet(s"${Manifests.segDir(dir, 3L)}/pins")
    assert(RunLedger.resolve(spark, dir, "ghost").isEmpty,
      "an unpublished ledger segment must be invisible")
  }
}
