package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-shape diagnostics — the measurements that DECIDE the scale
  * strategies the rest of the engine implements (salting (q44), skew-safe
  * as-of slicing (q104), AQE skew-join thresholds): at 100 TB you profile
  * the key distribution FIRST, then pick the join plan.
  */
object Profiling {

  /** Key-skew profile: the `topN` heaviest keys of `keyCol` with their
    * row count, share of total rows, and skew factor (count ÷ the mean
    * rows-per-key — 1.0 = perfectly uniform; the salting threshold in
    * practice). One partial/final count agg on the key plus a 1-row
    * broadcast of the totals — the fact never shuffles twice, and the
    * driver never sees more than `topN` rows.
    *
    * Determinism: counts and key cardinality are exact longs; share and
    * skew are each ONE double division of exact integers, so the values
    * (and the total-ordered top-N cut: count desc, key asc) are
    * partition- and engine-independent. */
  def keySkew(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum("cnt").as("total_rows"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .withColumn("share", col("cnt").cast("double") / col("total_rows"))
      .withColumn("skew_factor",
        (col("cnt") * col("n_keys")).cast("double") / col("total_rows"))
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(topN)
      .select(keyCol, "cnt", "share", "skew_factor")
  }

  /** Oracle spelling of [[keySkew]]. */
  def keySkewSql(from: String, keyCol: String, topN: Int): String =
    s"""WITH c AS (SELECT $keyCol, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM $from GROUP BY 1),
       |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
       |  CAST(COUNT(*) AS BIGINT) AS n_keys FROM c)
       |SELECT $keyCol, cnt,
       |  CAST(cnt AS DOUBLE) / total_rows AS share,
       |  CAST(cnt * n_keys AS DOUBLE) / total_rows AS skew_factor
       |FROM c, t ORDER BY cnt DESC, $keyCol LIMIT $topN""".stripMargin
}
