package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy transforms for publishing training/analytics extracts:
  * deterministic pseudonymization plus k-anonymity suppression over the
  * quasi-identifier columns (Sweeney, "k-Anonymity: a model for
  * protecting privacy", 2002).
  *
  * Scale shape: pseudonymization and banding are pure projections; the
  * k-anonymity gate is one window count over the quasi-identifier key —
  * a single shuffle, no self-join, no driver state.
  */
object Privacy {

  /** Publish-safe customer extract: the direct identifier (`c_name`)
    * becomes a SHA-256 pseudonym (deterministic, so longitudinal joins
    * across extracts still work), the account balance is generalized to
    * a `bandWidth`-sized band, and any row whose quasi-identifier
    * combination `(acctbal_band, c_mktsegment)` is shared by fewer than
    * `k` customers is suppressed — every surviving row is
    * indistinguishable from at least k-1 others. */
  def anonymizeCustomers(customer: DataFrame, k: Int,
      bandWidth: Int = 1000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val banded = customer.select(
      sha2(col("c_name"), 256).as("pseudo_id"),
      (floor(col("c_acctbal") / bandWidth) * bandWidth).cast("long")
        .as("acctbal_band"),
      col("c_mktsegment"))
    val quasi = Window.partitionBy("acctbal_band", "c_mktsegment")
    banded.withColumn("_gsize", count(lit(1)).over(quasi))
      .where(col("_gsize") >= k).drop("_gsize")
  }

  /** Email pattern shared by the scrubber and its oracle twin — kept to
    * the Java-regex ∩ RE2 dialect intersection (no lookaround, no
    * backrefs) so Spark and DuckDB match identically. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American dashed phone shape (`555-123-4567`), same dialect
    * constraint as [[EmailPattern]] (`\b` is ASCII word boundary in
    * both engines). */
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** PII scrub for publishing a text corpus: emails → `[EMAIL]`, dashed
    * phone numbers → `[PHONE]`, with per-document match counts kept for
    * the redaction audit. Pure codegen'd projections (regexp_replace /
    * regexp_extract_all) — runs at scan speed, no shuffle, no UDF; at
    * 100 TB this is a map-only pass. Counts are computed on the ORIGINAL
    * text (before replacement), so audit totals survive the scrub. */
  def scrubPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0)))
          .cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(col(textCol), lit(PhonePattern), lit(0)))
          .cast("long"))
      .withColumn(textCol,
        regexp_replace(
          regexp_replace(col(textCol), EmailPattern, "[EMAIL]"),
          PhonePattern, "[PHONE]"))

  /** Oracle-twin scrub/count SQL fragments over a text expression.
    * DuckDB's `regexp_replace` replaces the FIRST match unless the 'g'
    * flag is passed (Spark always replaces all). */
  object ScrubSql {
    def scrubbed(t: String): String =
      s"regexp_replace(regexp_replace($t, '$EmailPattern', '[EMAIL]', 'g'), " +
        s"'$PhonePattern', '[PHONE]', 'g')"
    def emailCount(t: String): String =
      s"CAST(len(regexp_extract_all($t, '$EmailPattern')) AS BIGINT)"
    def phoneCount(t: String): String =
      s"CAST(len(regexp_extract_all($t, '$PhonePattern')) AS BIGINT)"
  }

  /** 16-digit card-candidate pattern with digit-boundary guards in the
    * Java-regex ∩ RE2 intersection (RE2 has no lookbehind): the card
    * run is capture group 2, the guards consume one non-digit (or
    * anchor) on each side — so a 17-digit run is NOT a candidate, same
    * semantics as the kernel's exactly-16 maximal-run rule. */
  val CardCandidatePattern = "(^|[^0-9])([0-9]{16})($|[^0-9])"

  /** PII scrub for PAYMENT CARDS — the checksum-validated detector:
    * `\d{16}` alone redacts every order number and hash fragment (90%
    * of random 16-digit strings fail Luhn), so production scrubbers
    * validate ISO/IEC 7812 Luhn before redacting. Emits the raw
    * candidate count (regex), the VALID count, and the text with only
    * Luhn-valid runs replaced by `[CARD]` — both the validation and the
    * replacement are one codegen'd byte-scan kernel
    * ([[graft.functions.TextKernels.cardScrub]]), so like [[scrubPii]]
    * this is a map-only pass at any scale. Counts computed on the
    * original text, the audit convention. */
  def scrubCards(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_card_candidates",
        size(regexp_extract_all(col(textCol), lit(CardCandidatePattern),
          lit(2))).cast("long"))
      .withColumn("n_cards",
        graft.functions.TextKernels.cardCountCol(col(textCol)).cast("long"))
      .withColumn(textCol,
        graft.functions.TextKernels.cardScrubCol(col(textCol)))

  /** DuckDB Luhn sum of a 16-digit string expression `x` — 16 fixed
    * substr terms (position i from the left is doubled when odd, the
    * standard pattern for even-length numbers), generated so the oracle
    * REPLAYS the checksum rather than trusting the planted layout. */
  def luhnSumSql(x: String): String =
    (1 to 16).map { i =>
      val d = s"CAST(substr($x, $i, 1) AS INTEGER)"
      if (i % 2 == 1)
        s"(CASE WHEN 2 * $d > 9 THEN 2 * $d - 9 ELSE 2 * $d END)"
      else d
    }.mkString(" + ")

  /** Oracle twins of [[scrubCards]] over a text expression: candidates
    * via [[CardCandidatePattern]], validity via [[luhnSumSql]] in a
    * list lambda, the scrub via a replace fold over the valid list. */
  object CardSql {
    def candidates(t: String): String =
      s"regexp_extract_all($t, '$CardCandidatePattern', 2)"
    def validList(t: String): String =
      s"list_filter(${candidates(t)}, x -> (${luhnSumSql("x")}) % 10 = 0)"
    def candidateCount(t: String): String =
      s"CAST(len(${candidates(t)}) AS BIGINT)"
    def validCount(t: String): String =
      s"CAST(len(${validList(t)}) AS BIGINT)"
    def scrubbed(t: String): String =
      s"list_reduce(list_prepend($t, ${validList(t)}), " +
        "(acc, x) -> replace(acc, x, '[CARD]'))"
  }

  /** Deterministic planted card PAIR for the q189 corpus, shared by
    * both engines: 15 digits from the id (`4539` + zero-padded id),
    * then the Luhn check digit computed BY FORMULA — the first card of
    * the pair is valid by construction, the second flips the check
    * digit (+1 mod 10) and must survive the scrub. Integer arithmetic
    * only, so Spark and the SQL twin construct identical bytes. */
  def plantedCards(id: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val base15 = concat(lit("4539"),
      lpad((id % 100000000L).cast("string"), 11, "0"))
    val s15 = (1 to 15).map { i =>
      val d = substring(base15, i, 1).cast("int")
      if (i % 2 == 1) when(d * 2 > 9, d * 2 - 9).otherwise(d * 2) else d
    }.reduce(_ + _)
    val c = (lit(10) - (s15 % 10)) % 10
    (concat(base15, c.cast("string")),
      concat(base15, ((c + 1) % 10).cast("string")))
  }

  /** SQL twin of [[plantedCards]]' Luhn-sum over the 15-digit base
    * (doubling the left-odd positions — the weights the 16th check
    * digit completes). */
  def luhnSum15Sql(x: String): String =
    (1 to 15).map { i =>
      val d = s"CAST(substr($x, $i, 1) AS INTEGER)"
      if (i % 2 == 1)
        s"(CASE WHEN 2 * $d > 9 THEN 2 * $d - 9 ELSE 2 * $d END)"
      else d
    }.mkString(" + ")

  /** Oracle twin of [[anonymizeCustomers]] (`customer` hard-wired). */
  def anonymizeCustomersSql(k: Int, bandWidth: Int = 1000): String =
    s"""SELECT pseudo_id, acctbal_band, c_mktsegment FROM (
       |  SELECT sha256(c_name) AS pseudo_id,
       |    CAST(floor(c_acctbal / $bandWidth) * $bandWidth AS BIGINT)
       |      AS acctbal_band,
       |    c_mktsegment,
       |    count(*) OVER (PARTITION BY
       |      CAST(floor(c_acctbal / $bandWidth) * $bandWidth AS BIGINT),
       |      c_mktsegment) AS _gsize
       |  FROM customer) _
       |WHERE _gsize >= $k""".stripMargin
}
