package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.engine.{Aggregates, Dashboard, StarSchema}
import graft.functions.WeightedMean

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wide = StarSchema.wideView(spark, sf).cache()
  private lazy val am = Aggregates.airlineMonthlyPerformance(wide)

  test("airline monthly rollup: counts reconcile to fact total") {
    val total = am.agg(sum("depdel15_count")).as[Long].head()
    assert(total == wide.count())
  }

  test("pivot matrix: one row per airline, cells == the long-form rollup") {
    val piv = Aggregates.onTimePivot(am).cache()
    assert(piv.count() == am.select("airline_name").distinct().count())
    // Spot-reconcile every long-form cell against its pivoted position.
    val longForm = am.select("airline_name", "month", "on_time_rate").collect()
    val byAirline = piv.collect()
      .map(r => r.getString(0) -> r).toMap
    longForm.foreach { r =>
      val cell = byAirline(r.getString(0))
        .getAs[Double](f"m${r.getInt(1)}%02d")
      assert(cell == r.getDouble(2))
    }
    piv.unpersist()
  }

  test("rollup: detail + per-airline + grand total reconcile in one pass") {
    val ru = Aggregates.delayRollup(wide).cache()
    val grand = ru.filter(col("airline_name") === "ALL" && col("month") === -1)
    assert(grand.count() == 1)
    assert(grand.head().getAs[Long]("n_flights") == wide.count())
    // Per-airline subtotal == sum of that airline's detail rows.
    val airline = wide.select("airline_name").head().getString(0)
    val detailSum = ru.filter(col("airline_name") === airline && col("month") =!= -1)
      .agg(sum("n_flights")).head().getLong(0)
    val subtotal = ru.filter(col("airline_name") === airline && col("month") === -1)
      .head().getAs[Long]("n_flights")
    assert(detailSum == subtotal)
    ru.unpersist()
  }

  test("avg is partitioning-invariant — fixes reference quirk Q1 " +
    "(sum-of-per-chunk-means, aggregate_flight_data.py:37)") {
    val one = Aggregates.airlineMonthlyPerformance(wide.repartition(1))
      .orderBy("airline_name", "month").collect()
    val many = Aggregates.airlineMonthlyPerformance(wide.repartition(13))
      .orderBy("airline_name", "month").collect()
    assert(one.sameElements(many))
  }

  test("sumExact is exact and order-insensitive for decimal-valued doubles") {
    val vals = (1 to 1000).map(i => i / 100.0)
    val a = vals.toDF("x").repartition(1)
      .agg(Aggregates.sumExact($"x")).as[Double].head()
    val b = vals.reverse.toDF("x").repartition(17)
      .agg(Aggregates.sumExact($"x")).as[Double].head()
    assert(a == b && a == 5005.0)
  }

  test("weighted mean: exact value on literal data, partitioning-invariant") {
    val df = Seq((10.0, 1.0), (20.0, 3.0)).toDF("x", "w")
    val got = df.agg(WeightedMean($"x", $"w")).as[Double].head()
    assert(got == 17.5)
    val big = (1 to 5000).map(i => (i.toDouble, (i % 7 + 1).toDouble))
    val g1 = big.toDF("x", "w").repartition(1).agg(WeightedMean($"x", $"w"))
      .as[Double].head()
    val g2 = big.toDF("x", "w").repartition(23).agg(WeightedMean($"x", $"w"))
      .as[Double].head()
    assert(g1 == g2)
  }

  test("geo join drops cities without coords (C5 lookup + dropna)") {
    val ap = Aggregates.airportPerformance(wide)
    val geo = Dashboard.geoMap(ap, Aggregates.coordsDf(spark))
    val cities = geo.select("origin_city").as[String].collect().toSet
    assert(cities.subsetOf(Aggregates.cityCoords.map(_._1).toSet))
    assert(cities.nonEmpty)
  }

  test("master filter: empty selection selects all (B5 default)") {
    assert(Dashboard.masterFilter(Nil, Nil)(am).count() == am.count())
    val only3 = Dashboard.masterFilter(Seq(3), Nil)(am)
    assert(only3.select("month").distinct().as[Int].collect().toSeq == Seq(3))
  }

  test("kpis emit one row with non-negative totals and a sane OTP pct") {
    val Row(tot: Long, del: Long, can: Long, otp: Double) =
      Aggregates.kpis(am).head()
    assert(tot > 0 && del >= 0 && can >= 0 && otp >= 0.0 && otp <= 100.0)
  }

  test("delay attribution unpivots to exactly the four causes") {
    val causes = Aggregates.delayAttribution(am)
      .select("cause").as[String].collect().toSet
    assert(causes == Set("carrier", "weather", "nas", "late_aircraft"))
  }

  test("momDelta: first month has null delta, ma3 averages the open frame") {
    val rows = Aggregates.momDelta(am)
      .where(col("airline_name") === am.select(min("airline_name"))
        .as[String].head())
      .orderBy("month").collect()
    val means = rows.map(_.getAs[Double]("delay_minutes_mean"))
    assert(rows(0).isNullAt(rows(0).fieldIndex("mom_delta")))
    assert(rows(0).getAs[Double]("ma3") == means(0))
    assert(rows(1).getAs[Double]("mom_delta") == means(1) - means(0))
    assert(rows(1).getAs[Double]("ma3") == (means(1) + means(0)) / 2)
    assert(rows(2).getAs[Double]("ma3") == (means(2) + means(1) + means(0)) / 3)
  }

  test("cube = rollup + the per-month slice") {
    val rollup = Aggregates.delayRollup(wide)
    val cube = Aggregates.delayCube(wide).cache()
    assert(cube.exceptAll(rollup).count() ==
      wide.select("month").distinct().count(),
      "cube must add exactly one subtotal row per month")
    assert(rollup.exceptAll(cube).count() == 0,
      "every rollup row must appear in the cube")
  }

  test("pareto shares are monotone and end exactly at 1.0") {
    val rows = Aggregates.delayPareto(wide).orderBy("cum_share").collect()
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.last == 1.0,
      "exact decimal total must make the final share exactly 1.0")
    assert(shares.head > 0.0 && rows.length ==
      wide.select("airline_name").distinct().count())
  }

  test("mode city reconciles against a direct max count") {
    val modes = Aggregates.modeOriginCity(wide).cache()
    val direct = wide.groupBy("airline_name", "origin_city")
      .agg(count(lit(1)).as("n")).groupBy("airline_name")
      .agg(max("n").as("max_n"))
    // The mode's count must BE the airline's max city count.
    assert(modes.join(direct, "airline_name")
      .where(col("n_flights") =!= col("max_n")).count() == 0)
  }

  test("exact corr is in [-1, 1] and matches built-in corr to float noise") {
    val exact = Aggregates.delayPriceCorr(wide)
    val builtin = wide.groupBy("airline_name")
      .agg(corr(col("delay_minutes"), col("l_extendedprice")).as("c"))
    val j = exact.join(builtin, "airline_name").collect()
    j.foreach { r =>
      val e = r.getAs[Double]("corr_delay_price")
      assert(e >= -1.0 && e <= 1.0)
      assert(math.abs(e - r.getAs[Double]("c")) < 1e-6,
        s"exact-decimal corr diverged from built-in: $r")
    }
  }

  test("haversine: zero at identity, symmetric, London–Paris ≈ 344 km") {
    val d = Seq((51.5074, -0.1278, 48.8566, 2.3522))
      .toDF("la1", "lo1", "la2", "lo2")
      .select(
        Aggregates.haversineKm(col("la1"), col("lo1"), col("la2"), col("lo2"))
          .as("ab"),
        Aggregates.haversineKm(col("la2"), col("lo2"), col("la1"), col("lo1"))
          .as("ba"),
        Aggregates.haversineKm(col("la1"), col("lo1"), col("la1"), col("lo1"))
          .as("self"))
      .head()
    assert(math.abs(d.getDouble(0) - 343.5) < 1.0)
    assert(d.getDouble(0) == d.getDouble(1), "distance must be symmetric")
    assert(d.getDouble(2) == 0.0)
  }

  test("anomaly z-scores: no baseline for the first three months, flags rare") {
    val rows = Aggregates.delayAnomalies(am).cache()
    assert(rows.where(col("month") <= 3 && col("z_score").isNotNull)
      .count() == 0, "months 1-3 have no 3-month trailing baseline")
    val n = rows.count()
    val flagged = rows.where(col("is_anomaly") === 1).count()
    assert(flagged < n / 4, s"anomalies must be rare: $flagged/$n")
    // No flag without a score.
    assert(rows.where(col("is_anomaly") === 1 && col("z_score").isNull)
      .count() == 0)
  }

  test("MAD outliers: robust counts bounded, never the majority") {
    val rows = Aggregates.madOutliers(wide).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val frac = r.getAs[Long]("n_outliers").toDouble / r.getAs[Long]("n")
      // 50% breakdown: by construction at least half the points sit
      // within one MAD of the median, so 3·1.4826·MAD flags a minority.
      assert(frac < 0.5, s"MAD flagged a majority: $r")
      assert(r.getAs[Double]("mad") >= 0.0)
    }
  }

  test("outlier trim keeps at most the p99 mass and lowers the mean") {
    val trimmed = Aggregates.outlierTrim(wide).cache()
    val untrimmed = wide.groupBy("airline_name")
      .agg(count(lit(1)).as("n_all"),
        Aggregates.avgExact(col("delay_minutes")).as("mean_all"))
    val j = trimmed.join(untrimmed, "airline_name").collect()
    j.foreach { r =>
      val kept = r.getAs[Long]("n_kept").toDouble / r.getAs[Long]("n_all")
      assert(kept >= 0.98 && kept <= 1.0, s"p99 trim kept $kept")
      assert(r.getAs[Double]("trimmed_mean") <= r.getAs[Double]("mean_all"))
    }
  }

  test("monthly LOCF resample: dense spine, carried gaps, null leading months") {
    // Key a: observed Jan + Mar (Feb carries Jan's value; two Jan events
    // aggregate first). Key b: observed Feb only (Jan stays null — nothing
    // to carry; Mar carries Feb).
    val events = Seq(
      ("a", "2024-01-05", 10.0), ("a", "2024-01-20", 5.0),
      ("a", "2024-03-01", 7.0),
      ("b", "2024-02-10", 3.0)
    ).toDF("k", "d", "v").select(col("k"),
      to_timestamp(col("d")).as("ts"), col("v"))
    val got = Aggregates.monthlyLocf(events, "k", "ts",
      Aggregates.sumExact(col("v")), "filled")
      .orderBy("k", "month")
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      ("a", "2024-01", Some(15.0)),
      ("a", "2024-02", Some(15.0)),
      ("a", "2024-03", Some(7.0)),
      ("b", "2024-01", None),
      ("b", "2024-02", Some(3.0)),
      ("b", "2024-03", Some(3.0))))
  }
}
