package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (beyond the reference surface; see the build brief). All are either
  * Catalyst built-in compositions or native codegen'd kernels
  * ([[TextKernels]]) — no UDFs, no interpreted higher-order lambdas — so
  * they run at full scan speed over a 100 TB `documents` table and never
  * leave whole-stage codegen.
  *
  * Each function has an exact SQL twin used by the DuckDB oracle; where a
  * construction is engine-sensitive (float order, regex dialect) the twin
  * mirrors the exact evaluation order.
  */
object TextFunctions {

  /** Whitespace tokenization (single-space corpus; `split` keeps empties,
    * matching DuckDB `string_split`). */
  def tokens(c: Column): Column = split(c, " ")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: word pieces + isolated punctuation. ASCII `\w`
    * semantics agree between Java regex and RE2. */
  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit("\\w+|[^\\w\\s]"))

  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0)
      .otherwise(regexp_count(c, lit("[^a-zA-Z0-9\\s]")).cast("double") / length(c))

  /** Tokens ∈ `words` (marker/stopword hits) — a native one-byte-scan
    * kernel ([[TextKernels.MarkerHitsExpr]]). The higher-order form
    * ([[markerHitsHof]]) is semantically identical but evaluates as an
    * interpreted per-element lambda; this feeds every row of the q29/q39/
    * q40 hot paths, so it must stay inside whole-stage codegen. */
  def markerHits(c: Column, words: Seq[String]): Column =
    TextKernels.markerHitsCol(c, words)

  /** Interpreted reference form of [[markerHits]] (spec equivalence only). */
  private[graft] def markerHitsHof(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), t => t.isInCollection(words)))

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "is", "in", "it")

  def stopwordRatio(c: Column): Column =
    when(tokenCount(c) === 0, 0.0)
      .otherwise(markerHits(c, stopwords).cast("double") / tokenCount(c))

  /** Heuristic quality score ∈ [0,1]: length credit + low punctuation +
    * natural-language stopword density. Deterministic double arithmetic. */
  def qualityScore(c: Column): Column =
    least(tokenCount(c).cast("double") / 100.0, lit(1.0)) * 0.4 +
      (lit(1.0) - punctRatio(c)) * 0.3 +
      least(stopwordRatio(c) * 5.0, lit(1.0)) * 0.3

  /** Language markers for the n-gram/function-word language-ID heuristic.
    * Priority order breaks ties deterministically. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "una"))

  /** Language-ID: CJK characters → "zh"; otherwise the marker set with the
    * strictly highest hit count wins (priority order on ties); no hits →
    * "unknown". */
  def langId(c: Column): Column = {
    val hits = langMarkers.map { case (lang, ws) => lang -> markerHits(c, ws) }
    val best = hits.map(_._2).reduceLeft(greatest(_, _))
    // Fold from lowest to highest priority so the first-listed language
    // ends up as the outermost (winning) branch on ties.
    val ordered = hits.reverse.foldLeft(lit("unknown")) { case (acc, (lang, h)) =>
      when(h === best && best > 0, lit(lang)).otherwise(acc)
    }
    when(c.rlike("[一-鿿]"), lit("zh")).otherwise(ordered)
  }

  /** Canonical whitespace/case normalization used by the fingerprints. */
  def normalize(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** Content fingerprint: MD5 of the normalized text (byte-identical across
    * engines). */
  def fingerprintMd5(c: Column): Column = md5(normalize(c).cast("binary"))

  /** Rolling polynomial fingerprint over the normalized character stream:
    * `acc = (acc*31 + codepoint) mod 1e9+7`. Left-to-right, so the SQL twin
    * (list_reduce) reproduces it exactly. Computed by a native per-row
    * kernel ([[TextKernels.PolyFingerprintExpr]]); the higher-order form
    * ([[fingerprintPolyHof]]) allocates a one-char array element plus an
    * interpreted lambda call per character per row. */
  def fingerprintPoly(c: Column): Column =
    TextKernels.polyFingerprintCol(normalize(c))

  /** Interpreted reference form of [[fingerprintPoly]] (spec equivalence
    * only). */
  private[graft] def fingerprintPolyHof(c: Column): Column =
    aggregate(
      transform(split(normalize(c), ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => pmod(acc * 31 + x, lit(1000000007L)))

  /** SQL twins (DuckDB dialect). `x` is the text column/expression. */
  object Sql {
    private def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")

    def markerHits(x: String, ws: Seq[String]): String =
      s"len(list_filter(string_split($x, ' '), t -> t IN (${inList(ws)})))"

    def tokens(x: String) = s"string_split($x, ' ')"

    def tokenCount(x: String) = s"len(${tokens(x)})"

    def bpeTokenCount(x: String) =
      s"len(regexp_extract_all($x, '\\w+|[^\\w\\s]'))"

    def punctRatio(x: String): String =
      s"CASE WHEN length($x) = 0 THEN 0.0 ELSE " +
        s"CAST(len(regexp_extract_all($x, '[^a-zA-Z0-9\\s]')) AS DOUBLE) / length($x) END"

    def stopwordRatio(x: String): String =
      s"CASE WHEN ${tokenCount(x)} = 0 THEN 0.0 ELSE " +
        s"CAST(${markerHits(x, stopwords)} AS DOUBLE) / ${tokenCount(x)} END"

    def qualityScore(x: String): String =
      s"least(CAST(${tokenCount(x)} AS DOUBLE) / 100.0, 1.0) * 0.4 + " +
        s"(1.0 - ${punctRatio(x)}) * 0.3 + " +
        s"least(${stopwordRatio(x)} * 5.0, 1.0) * 0.3"

    def langId(x: String): String = {
      val hitExprs = langMarkers.map { case (l, ws) => l -> markerHits(x, ws) }
      val best = hitExprs.map(_._2).reduceLeft((a, b) => s"greatest($a, $b)")
      val cases = hitExprs.map { case (l, h) =>
        s"WHEN $h = $best AND $best > 0 THEN '$l'"
      }.mkString(" ")
      s"CASE WHEN regexp_matches($x, '[一-鿿]') THEN 'zh' $cases ELSE 'unknown' END"
    }

    def normalize(x: String) =
      s"regexp_replace(trim(lower($x)), '\\s+', ' ', 'g')"

    def fingerprintMd5(x: String) = s"md5(${normalize(x)})"

    def fingerprintPoly(x: String): String =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(regexp_extract_all(${normalize(x)}, '.'), " +
        s"ch -> CAST(ascii(ch) AS BIGINT))), " +
        s"(acc, v) -> (acc * 31 + v) % 1000000007)"
  }
}
