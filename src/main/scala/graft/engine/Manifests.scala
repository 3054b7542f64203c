package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned-manifest commits for multi-table persisted artifacts — the
  * [[graft.streaming.EventStream]] upsert-table protocol lifted into a
  * shared module, extended with the piece a low-write-amplification
  * index needs: IMMUTABLE DATA SEGMENTS referenced by versioned
  * manifests (the Iceberg/Delta metadata idea reduced to the two
  * filesystem primitives that ARE atomic on HDFS and local FS —
  * exclusive file create; file delete).
  *
  * Layout under an artifact `dir`:
  *
  *   - `seg<N>/ <table>/ *.parquet` — immutable data segments; a
  *     segment is written ONCE (by the commit that claims version N)
  *     and never rewritten while any kept manifest references it;
  *   - `v<N>` — the version-N MANIFEST FILE: one `table<TAB>ref` line
  *     per segment a table comprises (`ref` = `seg<M>/<table>`,
  *     relative to `dir`) — so an APPEND commit lists the old
  *     segments plus its own, paying O(|batch|) writes, while a
  *     rebuild/compaction lists only its own;
  *   - `MANIFEST-<N>` — the zero-byte PUBLISH marker: one atomic
  *     exclusive create, after which every resolution sees N.
  *
  * Reader contract: [[snapshot]] resolves the greatest published
  * marker ONCE and hands back the version's table→paths map; every
  * table the reader then opens comes from the SAME immutable snapshot
  * — no read-during-mutation window, unlike the dropped-marker gate
  * ([[Markers]]), where a reader arriving mid-append sees "no
  * completed artifact" and a concurrent reader/writer pair is only
  * contract-excluded. A resolved snapshot stays complete for at least
  * `keepVersions - 1` subsequent commits (the vacuum-retention
  * contract, sized to the longest reader).
  *
  * Crash recovery needs no branching: a death before the marker create
  * leaves an unpublished orphan segment/manifest that the claiming
  * replay OVERWRITES and GC eventually sweeps; a death inside GC
  * leaves stale markers/manifests/segments the next commit's sweep
  * reclaims (markers deleted strictly before what they reference).
  * Mutations of one artifact dir must be externally serialized
  * (single writer) — same contract as every stored artifact here;
  * readers need no coordination at all. */
object Manifests {

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerPath(dir: String, v: Long) =
    new org.apache.hadoop.fs.Path(dir, f"MANIFEST-$v%08d")
  private def manifestPath(dir: String, v: Long) =
    new org.apache.hadoop.fs.Path(dir, f"v$v%08d")

  /** Absolute path of version `v`'s data segment directory. */
  def segDir(dir: String, v: Long): String = f"$dir/seg$v%08d"
  private def segName(v: Long): String = f"seg$v%08d"

  /** Version named by a `MANIFEST-<N>` marker file name; None for any
    * malformed stray (tolerated by BOTH resolution and GC — the
    * EventStream lesson: a parser the sweep doesn't share wedges the
    * writer on junk a reader shrugs off). */
  private def parseMarkerVersion(name: String): Option[Long] =
    Some(name.stripPrefix("MANIFEST-"))
      .filter(s => name.startsWith("MANIFEST-") && s.nonEmpty &&
        s.forall(_.isDigit))
      .map(_.toLong)

  private def publishedVersions(
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .flatMap(parseMarkerVersion).sorted
  }

  /** The live (greatest published) version, if any. */
  def liveVersion(spark: SparkSession, dir: String): Option[Long] =
    publishedVersions(fsOf(spark, dir), dir).lastOption

  /** True iff `dir` holds at least one published version. */
  def exists(spark: SparkSession, dir: String): Boolean =
    liveVersion(spark, dir).nonEmpty

  /** A resolved immutable snapshot: table → `dir`-relative segment
    * refs, in manifest order. */
  final case class Snapshot(dir: String, version: Long,
      tables: Map[String, Seq[String]]) {
    /** Absolute parquet paths of `table` in THIS snapshot. */
    def paths(table: String): Seq[String] =
      tables.getOrElse(table, Seq.empty).map(r => s"$dir/$r")
    def read(spark: SparkSession, table: String): DataFrame = {
      val ps = paths(table)
      require(ps.nonEmpty, s"snapshot v$version of $dir has no table '$table'")
      spark.read.parquet(ps: _*)
    }
  }

  /** Resolve the LIVE snapshot (one marker listing + one small manifest
    * read); None on an unpublished dir. */
  def snapshot(spark: SparkSession, dir: String): Option[Snapshot] = {
    val fs = fsOf(spark, dir)
    publishedVersions(fs, dir).lastOption.map { v =>
      Snapshot(dir, v, readManifest(fs, dir, v))
    }
  }

  /** TIME TRAVEL: resolve a SPECIFIC published version — the
    * Delta/Iceberg `VERSION AS OF` read, free under this protocol
    * because every kept version is a complete immutable snapshot.
    * None when version `v` is not currently published (never built,
    * or aged past the writer's `keepVersions` horizon — the one
    * contract a historical reader sizes against). */
  def snapshotAt(spark: SparkSession, dir: String,
      v: Long): Option[Snapshot] = {
    val fs = fsOf(spark, dir)
    if (!publishedVersions(fs, dir).contains(v)) None
    else Some(Snapshot(dir, v, readManifest(fs, dir, v)))
  }

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, v: Long): Map[String, Seq[String]] = {
    val in = fs.open(manifestPath(dir, v))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    text.split("\n").toSeq.filter(_.nonEmpty)
      .map { line =>
        val Array(t, ref) = line.split("\t", 2)
        (t, ref)
      }
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2) }
  }

  /** ONE atomic commit: claim version N+1, let `stage` write new data
    * under `seg<N+1>/` (handed the claimed version, the segment's
    * absolute path, and the live snapshot — None on first build) and
    * return the FULL new table→refs map (use [[Snapshot.tables]] ++
    * own [[ref]]s for an append; only own refs for a rebuild), then
    * write the `v<N+1>` manifest, PUBLISH via exclusive marker create,
    * and GC manifests past `keepVersions` plus any segment no kept
    * manifest references. Returns the published version. */
  def publish(spark: SparkSession, dir: String, keepVersions: Int = 2)
      (stage: (Long, String, Option[Snapshot]) => Map[String, Seq[String]]): Long = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val fs = fsOf(spark, dir)
    val live = snapshot(spark, dir)
    val next = live.map(_.version).getOrElse(0L) + 1
    // Sweep any orphan a crashed predecessor left at this version.
    fs.delete(new org.apache.hadoop.fs.Path(segDir(dir, next)), true)
    fs.delete(manifestPath(dir, next), false)
    val tables = stage(next, segDir(dir, next), live)
    require(tables.nonEmpty, "a manifest commit must list at least one table")
    val out = fs.create(manifestPath(dir, next), true)
    try out.write(tables.toSeq.sortBy(_._1)
      .flatMap { case (t, rs) => rs.map(r => s"$t\t$r") }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // PUBLISH: one atomic exclusive create.
    fs.create(markerPath(dir, next), false).close()
    gc(fs, dir, keepVersions)
    next
  }

  /** Sweep everything below the keep horizon: markers strictly first
    * (no reachable marker ever names a deleted manifest), then
    * manifest files, then any `seg*` directory no KEPT manifest
    * references (which also reclaims segments orphaned by crashed
    * commits). Swept by LISTING, so state orphaned mid-GC is reclaimed
    * by the next commit instead of leaking. */
  private def gc(fs: org.apache.hadoop.fs.FileSystem, dir: String,
      keepVersions: Int): Unit = {
    val published = publishedVersions(fs, dir)
    if (published.isEmpty) return
    val kept = published.takeRight(keepVersions)
    val keepFrom = kept.head
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .toSeq.map(_.getPath.getName)
    names.flatMap(parseMarkerVersion).filter(_ < keepFrom)
      .foreach(v => fs.delete(markerPath(dir, v), false))
    names.filter(n => n.length > 1 && n.startsWith("v") &&
        n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong).filter(_ < keepFrom)
      .foreach(v => fs.delete(manifestPath(dir, v), false))
    val referenced = kept.flatMap(v => readManifest(fs, dir, v).values.flatten)
      .map(_.takeWhile(_ != '/')).toSet
    names.filter(n => n.startsWith("seg") &&
        n.drop(3).forall(_.isDigit) && n.length > 3)
      .filterNot(referenced.contains)
      .foreach(n => fs.delete(new org.apache.hadoop.fs.Path(dir, n), true))
  }

  /** `dir`-relative ref of `table` inside version `v`'s segment — what
    * a `stage` callback puts in its returned map. */
  def ref(v: Long, table: String): String = s"${segName(v)}/$table"

  /** Resolve the live snapshot — or the PINNED one when `atVersion` is
    * set (time travel) — failing with an actionable message otherwise:
    * the shared head of every stored-artifact reader and mutator.
    * `artifact` names the store kind ("MinHash index"); `buildHint`
    * says what to run first ("run buildMinhashIndex first"). */
  def resolveOrFail(spark: SparkSession, dir: String, artifact: String,
      buildHint: String, atVersion: Option[Long] = None): Snapshot = {
    val snapOpt = atVersion.map(snapshotAt(spark, dir, _))
      .getOrElse(snapshot(spark, dir))
    atVersion match {
      case Some(v) => require(snapOpt.nonEmpty,
        s"$artifact at $dir has no published version $v — never built, " +
          "or aged past the keep horizon")
      case None => require(snapOpt.nonEmpty,
        s"no completed $artifact at $dir — $buildHint")
    }
    snapOpt.get
  }
}
