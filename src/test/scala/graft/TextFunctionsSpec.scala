package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.TextFunctions

/** Kernel-vs-composition equivalence for the text-feature hot path: the
  * native [[graft.functions.TextKernels]] marker-hits and poly-fingerprint
  * expressions must be bit-identical to the interpreted higher-order forms
  * they replaced (which remain in [[TextFunctions]] as `*Hof` reference
  * implementations and mirror the DuckDB oracle twins exactly). Asserted
  * over the real sf0.001 documents corpus AND a crafted edge-case set the
  * corpus can't cover (multi-byte UTF-8, empty/blank strings, repeated
  * separators), since the synthetic corpus is single-spaced ASCII. */
class TextFunctionsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  private def edgeCases: DataFrame = {
    import spark.implicits._
    Seq(
      "",
      " ",
      "the",
      "the the the",
      "  the   of  ",            // repeated separators → empty tokens
      "the quick brown fox of it",
      "ThE Of AND to",           // case sensitivity: no hits
      "naïve café über straße",  // 2-byte UTF-8 sequences
      "the 一鿿 of ☃ and 👍",     // CJK (3-byte) + astral (4-byte)
      "der die das und ist nicht le la les y es una",
      "trailing space ",
      "a"
    ).toDF("text")
  }

  private def assertSame(df: DataFrame, a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): Unit = {
    val bad = df.select(a.as("kernel"), b.as("hof"))
      .filter(not(col("kernel") <=> col("hof")))
    assert(bad.count() == 0, bad.collect().take(5).mkString("; "))
  }

  test("native marker-hits kernel == filter/isInCollection composition") {
    for (df <- Seq(docs, edgeCases); ws <- TextFunctions.stopwords +:
        TextFunctions.langMarkers.map(_._2)) {
      assertSame(df,
        TextFunctions.markerHits(col("text"), ws),
        TextFunctions.markerHitsHof(col("text"), ws))
    }
  }

  test("native poly-fingerprint kernel == split/ascii/aggregate composition") {
    for (df <- Seq(docs, edgeCases)) {
      assertSame(df,
        TextFunctions.fingerprintPoly(col("text")),
        TextFunctions.fingerprintPolyHof(col("text")))
    }
  }

  test("quality gate and language-ID are unchanged by the kernel swap") {
    // End-to-end guard on the q39 gate inputs: score and language over the
    // corpus, rebuilt from the HOF reference forms, must agree exactly.
    val hofStopRatio =
      when(TextFunctions.tokenCount(col("text")) === 0, 0.0)
        .otherwise(
          TextFunctions.markerHitsHof(col("text"), TextFunctions.stopwords)
            .cast("double") / TextFunctions.tokenCount(col("text")))
    val hofQuality =
      least(TextFunctions.tokenCount(col("text")).cast("double") / 100.0,
        lit(1.0)) * 0.4 +
        (lit(1.0) - TextFunctions.punctRatio(col("text"))) * 0.3 +
        least(hofStopRatio * 5.0, lit(1.0)) * 0.3
    assertSame(docs, TextFunctions.qualityScore(col("text")), hofQuality)
    val hofHits = TextFunctions.langMarkers.map { case (lang, ws) =>
      lang -> TextFunctions.markerHitsHof(col("text"), ws)
    }
    val hofBest = hofHits.map(_._2).reduceLeft(greatest(_, _))
    val hofOrdered = hofHits.reverse.foldLeft(lit("unknown")) {
      case (acc, (lang, h)) =>
        when(h === hofBest && hofBest > 0, lit(lang)).otherwise(acc)
    }
    val hofLang = when(col("text").rlike("[一-鿿]"), lit("zh"))
      .otherwise(hofOrdered)
    assertSame(docs, TextFunctions.langId(col("text")), hofLang)
  }
}
