package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Partitioning-invariance properties for the analytics/monitoring
  * operators (OHLC downsampling, PSI drift) — their hash-gate
  * determinism rests on argmin/argmax commuting across partial
  * aggregation and on reduce-order-independent decimal sums, so the
  * results must be BIT-identical under any physical partitioning. */
object OperatorProperties extends Properties("Operators") {

  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  property("OHLC bars bit-identical under any partitioning (argmin/argmax commute)") =
    forAll(
      Gen.choose(2, 20).flatMap(n => Gen.listOfN(n, Gen.zip(
        Gen.choose(0, 5000), Gen.oneOf("view", "click"),
        Gen.chooseNum(-1000, 1000)))),
      Gen.choose(1, 7), Gen.choose(1, 7)) { (rows, p1, p2) =>
      import spark.implicits._
      val df = rows.zipWithIndex.map { case ((sec, ty, v), i) =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + sec * 1000L),
          ty, v / 10.0)
      }.toDF("event_id", "ts", "event_type", "value")
      def run(p: Int) = graft.operators.EventAnalytics
        .ohlcBars(df.repartition(p))
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7)))
        .sortBy(t => (t._1, t._2)).toSeq
      run(p1) == run(p2)
    }

  property("PSI bit-identical under any partitioning; self-PSI is exactly 0") =
    forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(-500, 500)),
      Gen.nonEmptyListOf(Gen.chooseNum(-500, 500)),
      Gen.choose(1, 7), Gen.choose(1, 7)) { (as, bs, p1, p2) =>
      import spark.implicits._
      val ref = as.map(_ / 10.0).toDF("v")
      val cur = bs.map(_ / 10.0).toDF("v")
      def run(p: Int) = graft.operators.Drift
        .psi(ref.repartition(p), cur.repartition(p), "v", 25.0)
        .head().getDouble(0)
      val self = graft.operators.Drift.psi(ref, ref, "v", 25.0)
        .head().getDouble(0)
      run(p1) == run(p2) && self == 0.0
    }

  property("pHash banding == brute force at Hamming <= 3 for ARBITRARY hash sets") =
    forAll(
      Gen.choose(2, 24).flatMap(n => Gen.listOfN(n, Gen.zip(
        // Base hashes plus a biased perturbation generator so near
        // pairs (0-4 flipped bits) actually occur instead of the
        // ~uniform 31-32-bit distances of independent 63-bit draws.
        Gen.choose(0L, (1L << 63) - 1), Gen.choose(0, 4),
        Gen.listOfN(4, Gen.choose(0, 62))))),
      Gen.choose(1, 7)) { (specs, parts) =>
      import spark.implicits._
      val hashes = specs.zipWithIndex.flatMap { case ((h, nFlip, bits), i) =>
        val base = h & ((1L << 63) - 1)
        val twin = bits.take(nFlip).foldLeft(base)((acc, b) => acc ^ (1L << b))
        Seq(graft.operators.ImageDedup.ImageHash(i * 2L, "ok", Some(base)),
          graft.operators.ImageDedup.ImageHash(i * 2L + 1, "ok", Some(twin)))
      }
      val ds = hashes.toDS().repartition(parts)
        .as[graft.operators.ImageDedup.ImageHash]
      val got = graft.operators.ImageDedup.nearDupPairs(ds, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      val flat = hashes.map(h => h.img_id -> h.phash.get)
      val brute = (for {
        (ia, ha) <- flat; (ib, hb) <- flat if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
      } yield (ia, ib, d)).sortBy(t => (t._1, t._2)).toSeq
      graft.engine.Caches.release()
      got == brute
    }

  property("BPE merge sequence invariant under document partitioning") =
    forAll(
      Gen.choose(1, 12).flatMap(n => Gen.listOfN(n,
        Gen.choose(1, 5).flatMap(w => Gen.listOfN(w,
          Gen.oneOf("ab", "aab", "abb", "ba", "a", "b", "x9!")))))
        .map(_.map(_.mkString(" "))),
      Gen.choose(1, 6), Gen.choose(1, 6)) { (texts, p1, p2) =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def run(p: Int) = graft.operators.CorpusStats
        .bpeTrain(df.repartition(p), "text", rounds = 4)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
      run(p1) == run(p2)
    }

  property("winnowing: planted shared spans >= w+k-1 always pair; every pair shares >= k chars") =
    forAll(
      // Random low-entropy host texts + a planted shared run of
      // exactly t = w + k - 1 = 11 chars spliced into docs 0 and 1 at
      // arbitrary offsets; remaining docs are unrelated noise.
      Gen.listOfN(4, Gen.choose(12, 40).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString))),
      Gen.listOfN(11, Gen.oneOf('X', 'Y', 'Z')).map(_.mkString),
      Gen.choose(0, 10), Gen.choose(0, 10)) { (hosts, run, o1, o2) =>
      import spark.implicits._
      val k = 8
      val w = 4
      def splice(host: String, at: Int): String = {
        val i = at % (host.length + 1)
        host.substring(0, i) + run + host.substring(i)
      }
      val texts = Seq(
        0L -> splice(hosts(0), o1),
        1L -> splice(hosts(1), o2),
        2L -> hosts(2),
        3L -> hosts(3))
      val df = texts.toDF("doc_id", "text")
      val pairs = graft.operators.Dedup
        .winnowedSpanPairs(df, "doc_id", "text", k, w, maxDf = Some(1000))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.engine.Caches.release()
      // RECALL (the winnowing theorem): the planted t-char run always
      // pairs docs 0 and 1, at any splice offsets. PRECISION (by the
      // gram-string join): any reported pair shares at least one exact
      // k-char substring — XYZ-alphabet runs never occur in abc-space
      // noise, so noise docs may pair only among themselves via a
      // genuinely shared abc substring.
      val byText = texts.toMap
      pairs.contains((0L, 1L)) && pairs.forall { case (a, b) =>
        val (ta, tb) = (byText(a), byText(b))
        (0 to ta.length - k).exists(i => tb.contains(ta.substring(i, i + k)))
      }
    }

  /** In-driver reference of [[graft.operators.Dedup.exciseBoilerplate]]:
    * mark every position covered by a gram at df >= minDf, drop marked
    * chars. The distributed interval-merge must equal this on ANY input. */
  private def naiveExcise(docs: Seq[(Long, String)], k: Int,
      minDf: Int): Seq[(Long, String, Long)] = {
    val gramsOf = (t: String) =>
      if (t.length >= k) (0 to t.length - k).map(p => t.substring(p, p + k))
      else Seq.empty[String]
    val df = docs.flatMap { case (id, t) => gramsOf(t).distinct.map(_ -> id) }
      .distinct.groupBy(_._1).map { case (g, xs) => g -> xs.size }
    val boiler = df.collect { case (g, n) if n >= minDf => g }.toSet
    docs.map { case (id, t) =>
      val marked = Array.fill(t.length)(false)
      for (p <- 0 to t.length - k if t.length >= k && boiler(t.substring(p, p + k));
           i <- p until p + k) marked(i) = true
      val clean = t.zipWithIndex.collect { case (c, i) if !marked(i) => c }
        .mkString
      (id, clean, (t.length - clean.length).toLong)
    }
  }

  property("boilerplate excision == position-marking reference on arbitrary corpora") =
    forAll(
      // Tiny alphabet so cross-document repeats actually occur; doc
      // count and lengths cover empty, sub-k, and long cases.
      Gen.choose(2, 6).flatMap(n => Gen.listOfN(n,
        Gen.choose(0, 40).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf('a', 'b', ' ')).map(_.mkString))))) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = graft.operators.Dedup
        .exciseBoilerplate(docs.toDF("doc_id", "text"), "doc_id", "text",
          k = 4, minDf = 2)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      graft.engine.Caches.release()
      got == naiveExcise(docs, k = 4, minDf = 2).sortBy(_._1)
    }

  property("cluster-safe splits: one split per cluster, inherited from the representative") =
    forAll(
      Gen.choose(3, 8).flatMap(n => Gen.listOfN(n,
        Gen.choose(5, 25).flatMap(len =>
          Gen.listOfN(len, Gen.alphaLowerChar).map(_.mkString)))),
      Gen.listOf(Gen.zip(Gen.choose(0, 7), Gen.choose(0, 7)))) { (texts, edges) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val ids = docs.map(_._1).toSet
      val pairDf = edges.map { case (a, b) => (a.toLong, b.toLong) }
        .filter { case (a, b) => a < b && ids(a) && ids(b) }
        .toDF("id_a", "id_b")
      val clusters = graft.operators.Dedup.dedupClusters(pairDf)
      val out = graft.operators.Sampling
        .clusterSafeSplits(docs.toDF("doc_id", "text"), "doc_id", "text",
          clusters)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      graft.engine.Caches.release()
      val naive = graft.operators.Sampling
        .assignSplits(docs.toDF("doc_id", "text"), "text")
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("bucket"), r.getAs[String]("split"))).toMap
      // Coverage; one (bucket, split) per cluster; and the inherited
      // value is exactly the representative's own content split.
      out.map(_._1).toSet == ids &&
        out.groupBy(_._2).values.forall(g => g.map(x => (x._3, x._4)).toSet.size == 1) &&
        out.forall { case (_, rep, b, s) => naive(rep) == ((b, s)) }
    }
}
