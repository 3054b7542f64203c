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

  test("mixturePlan: rates, epochs, loud failure on missing languages") {
    import spark.implicits._
    import graft.operators.Selection
    // Token mass: en 10 ("a"x10 over two docs), de 2.
    val d = Seq(
      ("en", "a a a a a"), ("en", "b b b b b"), ("de", "c c"))
      .toDF("lang", "text")
    val plan = Selection.mixturePlan(d, "lang", "text",
      targets = Seq("en" -> 0.5, "de" -> 0.4, "ja" -> 0.1),
      budget = 20L, maxEpochs = 3)
      .orderBy("lang").collect()
    val byLang = plan.map(r => r.getString(0) -> r).toMap
    val en = byLang("en") // target 10 of avail 10 → rate 1, 1 epoch
    assert(en.getAs[Long]("target_tokens") == 10L &&
      en.getAs[Double]("sampling_rate") == 1.0 &&
      en.getAs[Int]("epochs") == 1 &&
      en.getAs[Int]("satisfiable") == 1 &&
      en.getAs[Long]("unique_tokens_used") == 10L)
    val de = byLang("de") // target 8 of avail 2 → rate 4 > cap 3
    assert(de.getAs[Double]("sampling_rate") == 4.0 &&
      de.getAs[Int]("epochs") == 4 &&
      de.getAs[Int]("satisfiable") == 0,
      "over-the-epoch-cap upsampling must be flagged")
    val ja = byLang("ja") // target but zero data
    assert(ja.getAs[Long]("available_tokens") == 0L &&
      ja.getAs[Int]("epochs") == 0 &&
      ja.getAs[Int]("satisfiable") == 0,
      "a language with no data fails loudly, never renormalizes")
  }
}
