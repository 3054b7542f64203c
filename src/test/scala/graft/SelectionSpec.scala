package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.Selection

/** DSIR importance weighting: closed-form fixture (including an exact
  * weight tie resolved by doc_id) and corpus-level invariants. */
class SelectionSpec extends SparkSpec {

  test("DSIR log-weights match the closed form; ties cut deterministically") {
    import spark.implicits._
    // Target = en {d0 "x x y", d1 "y z"}, source = de {d2 "x z z", d3 "y y"}.
    // ct: x2 y2 z1, Nt 5; cs: x1 y2 z2, Ns 5; V 3 →
    // llr(x) = ln(3/8)−ln(2/8) = ln 1.5, llr(y) = 0, llr(z) = ln(2/3).
    val docs = Seq(
      (0L, "x x y", "en"), (1L, "y z", "en"),
      (2L, "x z z", "de"), (3L, "y y", "de"))
      .toDF("doc_id", "text", "lang")
    val got = Selection.dsirSelect(docs, col("lang") === "en", topN = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val l15 = math.log(1.5); val l23 = math.log(2.0 / 3.0)
    def q6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // d0 = 2·ln1.5 ≈ .811, d3 = 0, and d1 = ln(2/3) EQUALS
    // d2 = ln1.5 + 2·ln(2/3) — an exact tie the doc_id order must break.
    assert(got.map(_._1).toSeq == Seq(0L, 3L, 1L, 2L))
    assert(got.map(_._2).toSeq == Seq(3L, 2L, 2L, 3L)) // token counts
    assert(math.abs(got(0)._3 - q6(2 * l15)) < 1e-9)
    assert(got(1)._3 == 0.0)
    assert(math.abs(got(2)._3 - q6(l23)) < 1e-9)
    assert(math.abs(got(3)._3 - (q6(l15) + q6(2 * l23))) < 1e-9)
  }

  test("corpus invariants: target-like docs outrank source-like docs on average") {
    val docs = Tables.documents(spark, sf)
    val n = 100
    val sel = Selection.dsirSelect(docs, col("lang") === "en", topN = n)
    val picked = sel.join(docs.select("doc_id", "lang"), "doc_id")
    val enShareSelected = picked.filter(col("lang") === "en").count().toDouble / n
    val enShareCorpus = docs.filter(col("lang") === "en").count().toDouble /
      docs.count()
    // The whole point of DSIR: the selected slice is enriched in the
    // target distribution (here decisively — per-lang vocab differs).
    assert(enShareSelected > enShareCorpus,
      s"selected en-share $enShareSelected <= corpus $enShareCorpus")
    assert(sel.count() == n)
  }
}
