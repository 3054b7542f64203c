package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Single-pass declarative data-quality audit (the Deequ/Great-
  * Expectations shape): each check compiles to one aggregate expression,
  * ALL checks run in ONE aggregation over ONE scan — at 100 TB the audit
  * costs exactly one pass regardless of how many constraints it carries
  * — and the wide result unpivots to a long-form report via `stack`.
  */
object QualityReport {

  /** One constraint: `name` plus the fraction-satisfied aggregate. */
  final case class Check(name: String, frac: Column)

  /** Zero-denominator-safe fraction (ANSI mode throws on x/0): an audit
    * over zero rows reports NULL, not an error. */
  private def safeFrac(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den)

  /** Fraction of rows with `c` present. */
  def completeness(c: String): Check =
    Check(s"completeness_$c", safeFrac(count(col(c)), count(lit(1))))

  /** Fraction of distinct values of `c` among all rows — 1.0 iff `c` is
    * a key. (`count_distinct` keeps the single-pass property: it
    * compiles into the same aggregation, at the cost of an expand.) */
  def uniqueness(c: String): Check =
    Check(s"uniqueness_$c", safeFrac(count_distinct(col(c)), count(lit(1))))

  /** Fraction of non-null values inside [lo, hi]. */
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"range_$c",
      safeFrac(sum(when(col(c).between(lo, hi), 1L).otherwise(0L)),
        count(col(c))))

  /** Fraction of non-null values in the allowed set. */
  def isIn(c: String, allowed: Seq[String]): Check =
    Check(s"membership_$c",
      safeFrac(sum(when(col(c).isInCollection(allowed), 1L).otherwise(0L)),
        count(col(c))))

  /** Run every check in one aggregation; long-form (check, frac) rows. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val wideRow = df.agg(checks.head.frac.as(checks.head.name),
      checks.tail.map(c => c.frac.as(c.name)): _*)
    val stackArgs = checks
      .map(c => s"'${c.name}', ${c.name}").mkString(", ")
    wideRow.selectExpr(
      s"stack(${checks.length}, $stackArgs) AS (check_name, frac)")
  }

  /** In-flight audit: attach the checks to a flowing DataFrame as
    * OBSERVED metrics — they are computed by the job that was running
    * anyway (the write, the downstream agg), costing ZERO extra passes,
    * and land in the returned [[Observation]] after the first action.
    * The audit-then-write pattern scans twice; this is the 100 TB form.
    *
    * Caveat (Spark contract): observed metrics reject DISTINCT
    * aggregates, so [[uniqueness]] checks cannot ride along — use
    * [[audit]] for those. */
  def auditInFlight(df: DataFrame,
      checks: Seq[Check]): (DataFrame, Observation) = {
    require(checks.nonEmpty, "auditInFlight needs at least one check")
    val obs = Observation()
    (df.observe(obs, checks.head.frac.as(checks.head.name),
      checks.tail.map(c => c.frac.as(c.name)): _*), obs)
  }

  /** Oracle twin: the same constraint set over the `orders` table as
    * used by q68 (UNION ALL of scalar aggregates — the oracle does not
    * need the single-pass property). */
  def ordersAuditSql(): String =
    """SELECT 'completeness_o_custkey' AS check_name,
      |  CAST(count(o_custkey) AS DOUBLE) / count(*) AS frac FROM orders
      |UNION ALL SELECT 'uniqueness_o_orderkey',
      |  CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*) FROM orders
      |UNION ALL SELECT 'range_o_totalprice',
      |  CAST(sum(CASE WHEN o_totalprice BETWEEN 0 AND 1000000
      |    THEN 1 ELSE 0 END) AS DOUBLE) / count(o_totalprice) FROM orders
      |UNION ALL SELECT 'membership_o_orderstatus',
      |  CAST(sum(CASE WHEN o_orderstatus IN ('F', 'O', 'P')
      |    THEN 1 ELSE 0 END) AS DOUBLE) / count(o_orderstatus)
      |  FROM orders""".stripMargin

  /** The q68 constraint set (kept next to its SQL twin). */
  def ordersChecks(): Seq[Check] = Seq(
    completeness("o_custkey"),
    uniqueness("o_orderkey"),
    inRange("o_totalprice", 0, 1000000),
    isIn("o_orderstatus", Seq("F", "O", "P")))
}
