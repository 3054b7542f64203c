package graft

import org.apache.spark.sql.functions._

import graft.operators.Drift

/** PSI drift: closed-form fixture, the identical-distribution zero
  * property, and directional sanity (a shifted snapshot scores higher
  * than a resampled one). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("PSI on a hand-built two-bin fixture matches the closed form") {
    // ref: 8 values in bin 0, 2 in bin 1; cur: 5 and 5. Width 10.
    val ref = (Seq.fill(8)(3.0) ++ Seq.fill(2)(13.0)).toDF("v")
    val cur = (Seq.fill(5)(7.0) ++ Seq.fill(5)(17.0)).toDF("v")
    val r = Drift.psi(ref, cur, "v", binWidth = 10.0).head()
    val (p0, p1) = (9.0 / 12, 3.0 / 12)   // (8+1)/(10+2), (2+1)/(10+2)
    val (q0, q1) = (6.0 / 12, 6.0 / 12)
    def q12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = q12((p0 - q0) * math.log(p0 / q0)) +
      q12((p1 - q1) * math.log(p1 / q1))
    assert(math.abs(r.getDouble(0) - want) < 1e-12, s"psi=${r.getDouble(0)} want=$want")
    assert(r.getLong(1) == 2 && r.getLong(2) == 10 && r.getLong(3) == 10)
  }

  test("PSI of a distribution against itself is ~0; a shift scores higher") {
    val ev = graft.engine.Tables.events(spark, sf)
    val even = ev.filter(col("event_id") % 2 === 0)
    val odd = ev.filter(col("event_id") % 2 === 1)
    val self = Drift.psi(even, even, "value", 50.0).head().getDouble(0)
    assert(self == 0.0, s"identical snapshots must score exactly 0, got $self")
    val parity = Drift.psi(even, odd, "value", 50.0).head().getDouble(0)
    val shifted = Drift.psi(even,
      odd.withColumn("value", col("value") * 1.5), "value", 50.0)
      .head().getDouble(0)
    assert(parity >= 0 && parity < 0.1,
      s"random parity split should be stable (<0.1), got $parity")
    assert(shifted > parity && shifted > 0.1,
      s"a 1.5x scale shift must register as drift, got $shifted vs $parity")
  }

  test("categorical PSI: key bins, smoothing, and agreement with numeric-binned PSI") {
    // Keys 'a','b','c' with the same counts as the numeric fixture's
    // bins — categorical and numeric forms must produce the SAME psi.
    val refN = (Seq.fill(8)(3.0) ++ Seq.fill(2)(13.0)).toDF("v")
    val curN = (Seq.fill(5)(7.0) ++ Seq.fill(5)(17.0)).toDF("v")
    val refC = (Seq.fill(8)("a") ++ Seq.fill(2)("b")).toDF("k")
    val curC = (Seq.fill(5)("a") ++ Seq.fill(5)("b")).toDF("k")
    val num = Drift.psi(refN, curN, "v", 10.0).head().getDouble(0)
    val cat = Drift.psiCategorical(refC, curC, "k").head().getDouble(0)
    assert(cat == num, s"categorical $cat != numeric $num")
    // A key present on one side only is a one-sided bin: finite.
    val lop = Drift.psiCategorical(
      Seq("a", "a", "z").toDF("k"), Seq("a", "y").toDF("k"), "k")
      .head()
    assert(!lop.getDouble(0).isNaN && !lop.getDouble(0).isInfinite)
    assert(lop.getLong(1) == 3) // union bins: a, z, y
    // NULL keys are ONE shared bin, not two unmatched ones (the join
    // is null-safe): bins = {a, null} on both sides.
    val withNulls = Drift.psiCategorical(
      Seq(Some("a"), None, None).toDF("k"),
      Seq(Some("a"), None).toDF("k"), "k").head()
    assert(withNulls.getLong(1) == 2,
      s"null key must be one shared bin, got n_bins=${withNulls.getLong(1)}")
    assert(!withNulls.getDouble(0).isNaN)
  }

  test("one-sided bins stay finite via smoothing; empty inputs are total") {
    val ref = Seq(5.0, 15.0).toDF("v")
    val cur = Seq(5.0, 95.0).toDF("v")   // bin 1 empty in cur, bin 9 in ref
    val bins = Drift.psiBins(ref, cur, "v", 10.0).collect()
    assert(bins.length == 3)
    assert(bins.forall(r => !r.getDouble(5).isNaN && !r.getDouble(5).isInfinite))
    val empty = Seq.empty[Double].toDF("v")
    assert(Drift.psi(empty, empty, "v", 10.0).head().getLong(1) == 0)
  }

  test("embedding drift: self is exactly 0; a flipped cloud scores far higher") {
    import spark.implicits._
    // Deterministic DIRECTIONALLY-BIASED vectors (the +1.5 offset puts
    // the cloud in a half-space; a negation-symmetric cloud would have
    // a complement-invariant sign histogram and flipping it would be
    // invisible — the correct behavior, but not what this test plants).
    // 3-bit buckets (8 bins) keep per-bin counts well above the
    // add-one smoothing floor at this fixture size — 256 bins would
    // smooth a 256-vector histogram toward uniform and mute the PSI.
    val vecs = (0 until 256).map { i =>
      (i.toLong, Array.tabulate(64)(d =>
        (math.sin(i * 31 + d * 7) + 1.5).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val self = Drift.embeddingDrift(emb, emb, nBits = 3).head()
    assert(self.getDouble(0) == 0.0, s"self-drift must be 0: $self")
    // Negating every vector flips every SRP sign bit: all mass moves
    // to complementary buckets — maximal directional drift.
    val flipped = emb.select(col("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"))
    val moved = Drift.embeddingDrift(emb, flipped, nBits = 3)
      .head().getDouble(0)
    assert(moved > 1.0, s"flipped cloud should register heavy drift: $moved")
  }
}
