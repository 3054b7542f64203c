package graft

import java.util.concurrent.CountDownLatch

import graft.engine.Manifests
import graft.streaming.IncrementalIngest

/** Randomized-interleaving stress for the claim protocol: three
  * hand-found races were closed across two review passes, and
  * hand-reasoning about interleavings has diminishing returns — so
  * this spec drives N concurrent actors through SEEDED random schedules
  * of {append, compact, GC-heavy publish, rollback, snapshot,
  * snapshotAt, history} against ONE store and checks the protocol's
  * invariants mechanically:
  *
  *   1. AT MOST ONE WINNER PER VERSION — two actors can never both
  *      publish the same version number (the claim's whole point);
  *   2. EVERY RESOLVED SNAPSHOT IS COMPLETE — all referenced segment
  *      paths exist; a missing ref is legal ONLY when the store has
  *      already advanced past the resolved version (the keep-horizon
  *      contract under keepVersions = 1, where each commit may retire
  *      its predecessor);
  *   3. MUTATORS FAIL ONLY THE DOCUMENTED WAYS — a lost race is a
  *      loud IllegalStateException (claim conflict / stale view) or
  *      IllegalArgumentException (rollback target aged out), never a
  *      torn commit, a wedge, or an undocumented exception;
  *   4. THE FINAL STATE IS SOUND — the live snapshot reads, history
  *      parses, and the live version equals the greatest won version.
  *
  * Segments are real (tiny) parquet files cloned from one template by
  * filesystem copy, so a 200-commit storm costs filesystem metadata,
  * not 200 Spark jobs — while history()'s parquet row counts stay
  * honest. Seeds are fixed in the source for replay; a failure message
  * names the seed. */
class ManifestsConcurrencySpec extends SparkSpec {

  private lazy val conf = spark.sparkContext.hadoopConfiguration

  /** One tiny real parquet file to clone into every staged segment. */
  private lazy val templateFile: org.apache.hadoop.fs.Path = {
    import spark.implicits._
    val dir = s"${graft.engine.Sinks.scratch}/manifests_stress_template"
    IncrementalIngest.deleteDir(spark, dir)
    Seq((1L, "row")).toDF("id", "payload").coalesce(1).write.parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).find(_.getName.startsWith("part-")).get
  }

  private def stageTemplate(seg: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$seg/t/part-00000.parquet")
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p.getParent)
    org.apache.hadoop.fs.FileUtil.copy(fs, templateFile, fs, p, false, conf)
    ()
  }

  private def runScenario(seed: Long, actors: Int, opsPerActor: Int): Unit = {
    val dir = s"${graft.engine.Sinks.scratch}/manifests_stress_$seed"
    IncrementalIngest.deleteDir(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val clue = s"[seed=$seed] "
    // A first commit so every op has a live store to race over.
    Manifests.publish(spark, dir, tag = "build") { (v, seg, _) =>
      stageTemplate(seg)
      Map("t" -> Seq(Manifests.ref(v, "t")))
    }
    val won = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val threads = (0 until actors).map { a =>
      new Thread(() => {
        val rnd = new scala.util.Random(seed * 1000 + a)
        start.await()
        try {
          var i = 0
          while (i < opsPerActor) {
            i += 1
            val op = rnd.nextInt(10)
            try {
              if (op <= 3) { // append (the common mutator)
                val v = Manifests.publish(spark, dir, keepVersions = 3,
                  tag = s"append_a$a") { (nv, seg, live) =>
                  stageTemplate(seg)
                  Map("t" -> (live.map(_.tables("t")).getOrElse(Seq.empty) :+
                    Manifests.ref(nv, "t")))
                }
                assert(won.add(v), clue +
                  s"version $v won twice — the claim admitted two writers")
              } else if (op == 4) { // compact: re-base to own segment
                val v = Manifests.publish(spark, dir, keepVersions = 3,
                  tag = s"compact_a$a") { (nv, seg, _) =>
                  stageTemplate(seg)
                  Map("t" -> Seq(Manifests.ref(nv, "t")))
                }
                assert(won.add(v), clue +
                  s"version $v won twice — the claim admitted two writers")
              } else if (op == 5) { // GC-heavy publish: retire everything older
                val v = Manifests.publish(spark, dir, keepVersions = 1,
                  tag = s"gcheavy_a$a") { (nv, seg, _) =>
                  stageTemplate(seg)
                  Map("t" -> Seq(Manifests.ref(nv, "t")))
                }
                assert(won.add(v), clue +
                  s"version $v won twice — the claim admitted two writers")
              } else if (op == 6) { // rollback to a currently-kept version
                Manifests.earliestVersion(spark, dir).foreach { ev =>
                  val v = Manifests.rollback(spark, dir, ev, keepVersions = 3)
                  assert(won.add(v), clue +
                    s"version $v won twice — the claim admitted two writers")
                }
              } else if (op == 7) { // snapshot + completeness check
                Manifests.snapshot(spark, dir).foreach { snap =>
                  val missing = snap.tables.values.flatten
                    .filterNot(r => fs.exists(
                      new org.apache.hadoop.fs.Path(s"$dir/$r")))
                  if (missing.nonEmpty) {
                    val liveNow = Manifests.liveVersion(spark, dir)
                    assert(liveNow.exists(_ > snap.version), clue +
                      s"snapshot v${snap.version} lost refs $missing while " +
                      s"still live ($liveNow) — GC swept a live snapshot")
                  }
                }
              } else if (op == 8) { // snapshotAt a nearby version
                val probe = Manifests.liveVersion(spark, dir)
                  .getOrElse(1L) - rnd.nextInt(4) + 1
                if (probe >= 1)
                  Manifests.snapshotAt(spark, dir, probe).foreach { snap =>
                    val missing = snap.tables.values.flatten
                      .filterNot(r => fs.exists(
                        new org.apache.hadoop.fs.Path(s"$dir/$r")))
                    if (missing.nonEmpty) {
                      val liveNow = Manifests.liveVersion(spark, dir)
                      assert(liveNow.exists(_ > snap.version), clue +
                        s"pinned v${snap.version} lost refs $missing while " +
                        "still live — GC swept a kept version")
                    }
                  }
              } else { // history must always parse (swept versions skip)
                Manifests.history(spark, dir).collect()
                ()
              }
            } catch {
              // The DOCUMENTED loss modes — and only these: a claim
              // conflict / stale-view refusal, or a rollback target
              // that aged out between resolution and the attempt.
              case e: IllegalStateException
                  if e.getMessage != null &&
                    (e.getMessage.contains("CLAIM") ||
                      e.getMessage.contains("published while")) => ()
              case e: IllegalArgumentException
                  if e.getMessage != null &&
                    e.getMessage.contains("keep horizon") => ()
            }
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(300000))
    assert(threads.forall(!_.isAlive), clue + "actor wedged (deadlock)")
    if (!errors.isEmpty)
      fail(clue + s"undocumented failure: ${errors.peek()}", errors.peek())
    // Final-state soundness: live snapshot reads real data, history
    // parses, live version == greatest won version, and no claim
    // outlived its commit.
    val fin = Manifests.snapshot(spark, dir).get
    assert(fin.read(spark, "t").count() >= 1L, clue + "final state unreadable")
    assert(Manifests.history(spark, dir).count() >= 1L)
    val wonMax = won.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    if (wonMax.nonEmpty)
      assert(fin.version == wonMax.max, clue +
        s"live ${fin.version} != max won version ${wonMax.max}")
    val strayClaims = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("CLAIM-"))
      .filter(n => n.drop(6).forall(_.isDigit) &&
        n.drop(6).toLong <= fin.version)
    assert(strayClaims.isEmpty, clue +
      s"claims at or below live survived every GC: ${strayClaims.toSeq}")
  }

  // Fixed seeds, recorded for replay: a failure names its seed, and
  // re-running the named seed reproduces the schedule (modulo OS
  // thread timing — the op SEQUENCES are deterministic per seed).
  for (seed <- Seq(1L, 7L, 42L, 1337L))
    test(s"claim-protocol stress survives seed $seed: unique winners, complete snapshots, documented losses only") {
      runScenario(seed, actors = 3, opsPerActor = 14)
    }
}
