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
