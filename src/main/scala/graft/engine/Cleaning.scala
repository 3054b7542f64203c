package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's row-level cleaning/feature expressions (SURVEY.md §2.H),
  * re-expressed as pure `Column => Column` builders over Spark built-ins.
  *
  * Everything here stays inside whole-stage codegen — no UDFs. The reference
  * implements these as vectorized pandas ops / row-wise Python lambdas
  * (`/root/reference/src/data_cleaning.py:37-53,61-64,103`); composing
  * Catalyst built-ins gives the same semantics with codegen + pushdown.
  */
object Cleaning {

  /** H1 — HHMM numeric clock time → "HH:MM" string; NULL→0 fill first;
    * literal `2400` wraps to `"0000"` before splitting.
    * Reference: `format_time`, `/root/reference/src/data_cleaning.py:37-53`.
    */
  def formatHHMM(c: Column): Column = {
    val t = regexp_replace(
      lpad(coalesce(c, lit(0)).cast("int").cast("string"), 4, "0"),
      "^2400$", "0000")
    concat(substring(t, 1, 2), lit(":"), substring(t, 3, 2))
  }

  /** H1 variant guarded by B7's not-null mask: only format when the raw value
    * is present (cancelled flights keep NULL DepTime).
    * Reference: `/root/reference/src/data_cleaning.py:51-53`. */
  def formatHHMMIfPresent(c: Column): Column =
    when(c.isNotNull, formatHHMM(c))

  /** H2 — NULL→0 imputation (`fillna(0)`),
    * `/root/reference/src/data_cleaning.py:31-34,56-58`. */
  def fillZero(c: Column): Column = coalesce(c, lit(0.0))

  /** H4 — weekend threshold flag: ISO day-of-week >= 6 → 1 else 0.
    * Reference row-wise lambda `/root/reference/src/data_cleaning.py:103`;
    * here a codegen'd conditional. */
  def isWeekend(dayOfWeek: Column): Column =
    when(dayOfWeek >= 6, lit(1)).otherwise(lit(0))

  /** H3 — cancelled flag: prefer the explicit indicator when the source has
    * one, else infer from a NULL elapsed-time measure.
    * Reference: `/root/reference/src/data_cleaning.py:61-64`. The schema
    * branch resolves at plan-build time (Spark schemas are static). */
  def cancelledFlag(explicit: Option[Column], elapsed: Column): Column =
    explicit match {
      case Some(c) => coalesce(c, lit(0)).cast("int")
      case None    => elapsed.isNull.cast("int")
    }

  /** H6 — rate arithmetic with div-by-zero/empty guard:
    * `round(delayed/total*100, 2)`, NULL (0-denominator) → 0.
    * Reference: `/root/reference/src/app.py:168`,
    * `/root/reference/src/aggregate_flight_data.py:40`. */
  def ratePct(num: Column, den: Column): Column =
    round(when(den.isNull || den === 0, lit(0.0))
      .otherwise(num.cast("double") / den.cast("double") * 100), 2)

  /** H6 — on-time rate `1 - delayed/total`. */
  def onTimeRate(delayed: Column, total: Column): Column =
    lit(1.0) - delayed.cast("double") / total.cast("double")

  /** H7 — small value-map recode (month int → label), the reference's
    * `Series.map({1:'1月',...})` (`/root/reference/src/app.py:150`).
    * Chained `when` keeps it codegen'd; unmapped values → NULL like `map`. */
  def recode(c: Column, mapping: Seq[(Int, String)]): Column =
    mapping.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(c === lit(k), lit(v)).otherwise(acc)
    }
}
