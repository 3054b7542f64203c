package graft

import org.apache.spark.sql.functions._

import graft.engine.Cleaning

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def fmt(values: Seq[java.lang.Integer]): Seq[String] =
    values.toDF("t").select(Cleaning.formatHHMM($"t")).as[String].collect().toSeq

  test("formatHHMM formats, pads, and wraps 2400 (data_cleaning.py:37-53)") {
    assert(fmt(Seq(905, 2400, 0, 15, 2359, null)) ==
      Seq("09:05", "00:00", "00:00", "00:15", "23:59", "00:00"))
  }

  test("formatHHMMIfPresent keeps NULL for missing times (B7 mask)") {
    val got = Seq[java.lang.Integer](930, null).toDF("t")
      .select(Cleaning.formatHHMMIfPresent($"t")).collect().map(_.get(0))
    assert(got.toSeq == Seq("09:30", null))
  }

  test("isWeekend boundary at ISO dow >= 6 (data_cleaning.py:103)") {
    val got = Seq(5, 6, 7, 1).toDF("d")
      .select(Cleaning.isWeekend($"d")).as[Int].collect().toSeq
    assert(got == Seq(0, 1, 1, 0))
  }

  test("cancelledFlag prefers explicit column, else infers from NULL elapsed") {
    val df = Seq[(java.lang.Integer, java.lang.Double)](
      (1, 100.0), (null, 100.0), (null, null)).toDF("c", "e")
    val explicit = df.select(
      Cleaning.cancelledFlag(Some($"c"), $"e")).as[Int].collect().toSeq
    assert(explicit == Seq(1, 0, 0))
    val inferred = df.select(
      Cleaning.cancelledFlag(None, $"e")).as[Int].collect().toSeq
    assert(inferred == Seq(0, 0, 1))
  }

  test("recode maps known values, NULL otherwise (app.py:150)") {
    val got = Seq(1, 2, 9).toDF("m")
      .select(Cleaning.recode($"m", Seq(1 -> "Jan", 2 -> "Feb")))
      .collect().map(_.get(0))
    assert(got.toSeq == Seq("Jan", "Feb", null))
  }

  test("ratePct guards division by zero (app.py:96,168)") {
    val got = Seq((5, 10), (0, 0)).toDF("n", "d")
      .select(Cleaning.ratePct($"n", $"d")).as[Double].collect().toSeq
    assert(got == Seq(50.0, 0.0))
  }
}
