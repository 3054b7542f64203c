package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF covering the reference's weighted-average KPI (SURVEY.md
  * §2.D5, `/root/reference/src/app.py:96`): `Σ(x·w) / Σw`.
  *
  * The buffer holds exact decimal partial sums, not doubles, so the result
  * is independent of partitioning/combine order — a plain double buffer
  * would make the same query return different last-bits run to run on a
  * cluster. Inputs are quantized to 10 decimal places (HALF_UP), matching
  * the SQL construction `SUM(CAST(x*w AS DECIMAL(28,10)))` the DuckDB
  * oracle uses, so Spark and the oracle agree bit-for-bit.
  */
/** Exact decimal partial-sum buffer for [[WeightedMean]]. */
case class WeightedSumBuf(sumWX: BigDecimal, sumW: BigDecimal)

object WeightedMean extends Aggregator[(Double, Double), WeightedSumBuf, Double] {
  type Buf = WeightedSumBuf
  private def Buf(x: BigDecimal, w: BigDecimal) = WeightedSumBuf(x, w)

  private def q10(d: Double): BigDecimal =
    BigDecimal(new java.math.BigDecimal(d).setScale(10, RoundingMode.HALF_UP))

  override def zero: Buf = Buf(BigDecimal(0), BigDecimal(0))

  override def reduce(b: Buf, in: (Double, Double)): Buf =
    Buf(b.sumWX + q10(in._1 * in._2), b.sumW + q10(in._2))

  override def merge(a: Buf, b: Buf): Buf =
    Buf(a.sumWX + b.sumWX, a.sumW + b.sumW)

  override def finish(b: Buf): Double =
    if (b.sumW.signum == 0) 0.0
    else b.sumWX.toDouble / b.sumW.toDouble

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** The registered UDAF, built once — `udaf(...)` derives encoders and
    * codegen classes, so constructing it per call site churns classes on
    * every query (a measured contributor to late-suite JIT/code-cache
    * degradation). */
  private lazy val fn =
    udaf(this, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))

  /** Column-level entry point: `weighted_mean(value, weight)`. */
  def apply(value: Column, weight: Column): Column = fn(value, weight)

  /** Oracle-SQL twin: the exact decimal construction this Aggregator
    * implements. */
  def sql(x: String, w: String): String =
    s"CAST(SUM(CAST(($x) * ($w) AS DECIMAL(28,10))) AS DOUBLE) / " +
      s"CAST(SUM(CAST(($w) AS DECIMAL(28,10))) AS DOUBLE)"
}
