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
