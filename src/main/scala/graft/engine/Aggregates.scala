package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's aggregation tier (SURVEY.md §2.D), restated over the
  * wide view. Each function is a pure `DataFrame => DataFrame` plan
  * fragment; Spark's partial/final HashAggregate replaces the reference's
  * manual chunk-partial-then-combine (`aggregate_flight_data.py:26-37`) —
  * and fixes its quirk Q1 (sum-of-per-chunk-means): `avg` here decomposes
  * into (sum, count) and is correct under any partitioning.
  *
  * Float determinism: every floating-point SUM/AVG routes through
  * [[sumExact]] — cast to `DECIMAL(28,6)`, sum exactly (order-insensitive),
  * cast back to double. This makes results bit-identical across shuffle
  * orders, partition counts, AND engines (the DuckDB oracle applies the
  * same construction), which a plain double `sum()` is not. At 100 TB this
  * also means rerunning a query yields the same bytes — a property the
  * plain-double plan loses the moment AQE changes partitioning.
  */
object Aggregates {

  /** Order-insensitive exact sum of a (conceptually decimal) double
    * measure: `CAST(SUM(CAST(x AS DECIMAL(28,scale))) AS DOUBLE)`. */
  def sumExact(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Deterministic mean built from an exact sum and a count. */
  def avgExact(c: Column, scale: Int = 6): Column =
    sumExact(c, scale) / count(c)

  /** SQL (DuckDB dialect = ANSI) twins of the two helpers above. */
  def sumExactSql(x: String, scale: Int = 6): String =
    s"CAST(SUM(CAST($x AS DECIMAL(28,$scale))) AS DOUBLE)"
  def avgExactSql(x: String, scale: Int = 6): String =
    s"${sumExactSql(x, scale)} / COUNT($x)"

  /** D1 + H6 — the airline×month performance rollup
    * (`/root/reference/src/aggregate_flight_data.py:18-43`): counts, delayed
    * sums, mean delay, cancellation and per-cause delay totals, on-time rate.
    * The reference streams 200k-row chunks and combines partials by hand;
    * here it is one `groupBy().agg()` — Spark plans the identical
    * partial(map-side)/final(reduce-side) pair automatically. */
  def airlineMonthlyPerformance(wide: DataFrame): DataFrame = {
    val cause = (flag: String) =>
      when(col("l_returnflag") === flag, col("delay_minutes")).otherwise(lit(0.0))
    wide.groupBy("airline_name", "month")
      .agg(
        count(lit(1)).as("depdel15_count"),
        sum("dep_del15").as("depdel15_sum"),
        avgExact(col("delay_minutes")).as("delay_minutes_mean"),
        sum("is_cancelled").as("is_cancelled_sum"),
        sumExact(cause("A")).as("carrier_delay_sum"),
        sumExact(cause("N")).as("weather_delay_sum"),
        sumExact(cause("R")).as("nas_delay_sum"),
        sumExact(when(col("l_linestatus") === "F", col("delay_minutes"))
          .otherwise(lit(0.0))).as("late_aircraft_delay_sum"))
      .withColumn("on_time_rate",
        Cleaning.onTimeRate(col("depdel15_sum"), col("depdel15_count")))
  }

  /** Oracle twin of [[airlineMonthlyPerformance]] (FROM a `wide` CTE). */
  val airlineMonthlyPerformanceSql: String = {
    def cause(flag: String) =
      s"CASE WHEN l_returnflag = '$flag' THEN delay_minutes ELSE 0.0 END"
    s"""SELECT airline_name, month,
       |  COUNT(*) AS depdel15_count,
       |  SUM(dep_del15) AS depdel15_sum,
       |  ${avgExactSql("delay_minutes")} AS delay_minutes_mean,
       |  SUM(is_cancelled) AS is_cancelled_sum,
       |  ${sumExactSql(cause("A"))} AS carrier_delay_sum,
       |  ${sumExactSql(cause("N"))} AS weather_delay_sum,
       |  ${sumExactSql(cause("R"))} AS nas_delay_sum,
       |  ${sumExactSql("CASE WHEN l_linestatus = 'F' THEN delay_minutes ELSE 0.0 END")} AS late_aircraft_delay_sum,
       |  1.0 - CAST(SUM(dep_del15) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS on_time_rate
       |FROM wide GROUP BY airline_name, month""".stripMargin
  }

  /** D2 — airline×month×city rollup
    * (`/root/reference/src/aggregate_flight_data.py:51-60`). */
  def airportPerformance(wide: DataFrame): DataFrame =
    wide.groupBy("airline_name", "month", "origin_city")
      .agg(count(lit(1)).as("total_flights"),
        sum("dep_del15").as("delayed_flights"))

  val airportPerformanceSql: String =
    """SELECT airline_name, month, origin_city,
      |  COUNT(*) AS total_flights, SUM(dep_del15) AS delayed_flights
      |FROM wide GROUP BY airline_name, month, origin_city""".stripMargin

  /** C5 — the reference's 12-entry in-code city→(lat,lon) dict
    * (`/root/reference/src/aggregate_flight_data.py:65-72`), as a literal
    * dimension to broadcast-join (12 of the 25 nations are mapped; unmapped
    * cities drop via the inner join, reproducing `.map()` + `dropna`). */
  val cityCoords: Seq[(String, Double, Double)] = Seq(
    ("NATION_0", 36.75, 3.04), ("NATION_1", -34.61, -58.38),
    ("NATION_2", -15.79, -47.88), ("NATION_3", 45.42, -75.7),
    ("NATION_4", 39.91, 116.4), ("NATION_5", 30.06, 31.25),
    ("NATION_6", 48.86, 2.35), ("NATION_7", 52.52, 13.41),
    ("NATION_8", 28.61, 77.21), ("NATION_9", 35.68, 139.69),
    ("NATION_10", 51.51, -0.13), ("NATION_11", 38.91, -77.04))

  def coordsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    cityCoords.toDF("origin_city", "lat", "lon")
  }

  /** Bare VALUES list of [[cityCoords]] (re-aliasable). */
  val coordsValuesSql: String = cityCoords
    .map { case (c, la, lo) => s"('$c', $la, $lo)" }
    .mkString("(VALUES ", ", ", ")")

  /** VALUES-list twin of [[cityCoords]] for the oracle. */
  val coordsSql: String =
    s"$coordsValuesSql AS coords(origin_city, lat, lon)"

  /** C5 + B6 — attach coordinates; inner broadcast join reproduces the
    * lookup-then-dropna (`/root/reference/src/aggregate_flight_data.py:74-76`). */
  def withCoords(airportPerf: DataFrame, coords: DataFrame): DataFrame =
    airportPerf.join(broadcast(coords), Seq("origin_city"), "inner")

  /** D9 — geo re-aggregation over the composite (city,lat,lon) key after
    * dashboard filtering (`/root/reference/src/app.py:161-168`), plus the
    * guarded delay-rate percent (H6). */
  def geoAggregate(withCoords: DataFrame): DataFrame =
    withCoords.groupBy("origin_city", "lat", "lon")
      .agg(sum("total_flights").as("total_flights"),
        sum("delayed_flights").as("delayed_flights"))
      .withColumn("delay_rate",
        round(when(col("total_flights") > 0,
          col("delayed_flights").cast("double") / col("total_flights") * 100)
          .otherwise(lit(0.0)), 2))

  /** D4 + D5 — dashboard KPI scalars (`/root/reference/src/app.py:94-97`):
    * grand totals plus the count-weighted average on-time rate. */
  def kpis(airlineMonthly: DataFrame): DataFrame =
    airlineMonthly.agg(
      sum("depdel15_count").as("total_flights"),
      sum("depdel15_sum").as("delayed_flights"),
      sum("is_cancelled_sum").as("cancelled_flights"),
      (sumExact(col("on_time_rate") * col("depdel15_count"), 10)
        / sumExact(col("depdel15_count"), 10) * 100).as("avg_otp_pct"))

  /** D6 + F0b — airline ranking by unweighted mean of monthly means —
    * deliberately two-level, NOT a flight-weighted mean, matching
    * `/root/reference/src/app.py:117-118`. */
  def ranking(airlineMonthly: DataFrame): DataFrame =
    airlineMonthly.groupBy("airline_name")
      .agg((sumExact(col("delay_minutes_mean"), 10) / count(lit(1)))
        .as("avg_delay"))
      .orderBy("avg_delay", "airline_name")

  /** D7 + H7 — monthly on-time-rate trend with month-label recode
    * (`/root/reference/src/app.py:149-150`). */
  def trend(airlineMonthly: DataFrame): DataFrame = {
    val labels = Seq(1 -> "Jan", 2 -> "Feb", 3 -> "Mar", 4 -> "Apr",
      5 -> "May", 6 -> "Jun", 7 -> "Jul", 8 -> "Aug", 9 -> "Sep",
      10 -> "Oct", 11 -> "Nov", 12 -> "Dec")
    airlineMonthly.groupBy("month")
      .agg((sumExact(col("on_time_rate"), 10) / count(lit(1)))
        .as("avg_on_time_rate"))
      .withColumn("month_label", Cleaning.recode(col("month"), labels))
      .orderBy("month")
  }

  /** D8 — delay-cause attribution: four scalar sums unpivoted to
    * (cause, minutes) rows via `stack`, the shape the reference's pie chart
    * consumes (`/root/reference/src/app.py:134-137`). */
  def delayAttribution(airlineMonthly: DataFrame): DataFrame =
    airlineMonthly.agg(
      sumExact(col("carrier_delay_sum"), 6).as("carrier"),
      sumExact(col("weather_delay_sum"), 6).as("weather"),
      sumExact(col("nas_delay_sum"), 6).as("nas"),
      sumExact(col("late_aircraft_delay_sum"), 6).as("late_aircraft"))
      .select(expr(
        """stack(4, 'carrier', carrier, 'weather', weather,
          |'nas', nas, 'late_aircraft', late_aircraft)
          |AS (cause, minutes)""".stripMargin))

  /** D11 + F0c — sorted distinct value lists feeding the filter widgets
    * (`/root/reference/src/app.py:56,62`). */
  def distinctSorted(df: DataFrame, column: String): DataFrame =
    df.select(column).distinct().orderBy(column)

  /** D-ext — the BI wide-matrix form of the rollup: one row per airline,
    * one column per month (`pivot` with an EXPLICIT value list — an
    * unlisted-values pivot needs a discovery pass over the data and makes
    * the output schema data-dependent, both wrong at scale). `max` over
    * the single (airline, month) cell keeps the agg trivially exact. */
  def onTimePivot(am: DataFrame): DataFrame = {
    val months = 1 to 12
    am.groupBy("airline_name")
      .pivot("month", months)
      .agg(max("on_time_rate"))
      .select(col("airline_name") +:
        months.map(m => col(m.toString).as(f"m$m%02d")): _*)
  }

  /** Oracle twin of [[onTimePivot]] (FROM an `am` CTE): the classic
    * conditional-aggregation spelling of a pivot. */
  val onTimePivotSql: String =
    "SELECT airline_name, " +
      (1 to 12).map(m =>
        f"MAX(CASE WHEN month = $m THEN on_time_rate END) AS m$m%02d")
        .mkString(", ") +
      " FROM am GROUP BY airline_name"

  /** D-ext — ROLLUP subtotals over (airline, month): detail rows plus
    * per-airline and grand totals in one aggregation pass (Spark plans a
    * single expand + hash agg, not three jobs). Group keys are
    * sentinel-coalesced ('ALL' / -1) so the output carries no NULL keys —
    * NULL ordering and NULL hashing differ across engines, sentinels
    * don't. */
  def delayRollup(wide: DataFrame): DataFrame =
    wide.rollup(col("airline_name"), col("month"))
      .agg(count(lit(1)).as("n_flights"),
        sum("dep_del15").as("delayed_sum"),
        sumExact(col("delay_minutes")).as("delay_minutes_sum"))
      .select(
        coalesce(col("airline_name"), lit("ALL")).as("airline_name"),
        coalesce(col("month"), lit(-1)).as("month"),
        col("n_flights"), col("delayed_sum"), col("delay_minutes_sum"))

  /** Oracle twin of [[delayRollup]] (FROM a `wide` CTE). */
  val delayRollupSql: String =
    s"""SELECT COALESCE(airline_name, 'ALL') AS airline_name,
       |  COALESCE(month, -1) AS month,
       |  COUNT(*) AS n_flights,
       |  CAST(SUM(dep_del15) AS BIGINT) AS delayed_sum,
       |  ${sumExactSql("delay_minutes")} AS delay_minutes_sum
       |FROM wide GROUP BY ROLLUP (airline_name, month)""".stripMargin

  /** D-ext — CUBE over (airline, month): [[delayRollup]]'s lattice
    * completed with the per-month slice, still one expand + one
    * aggregation pass. Same sentinel-coalescing rationale. */
  def delayCube(wide: DataFrame): DataFrame =
    wide.cube(col("airline_name"), col("month"))
      .agg(count(lit(1)).as("n_flights"),
        sum("dep_del15").as("delayed_sum"),
        sumExact(col("delay_minutes")).as("delay_minutes_sum"))
      .select(
        coalesce(col("airline_name"), lit("ALL")).as("airline_name"),
        coalesce(col("month"), lit(-1)).as("month"),
        col("n_flights"), col("delayed_sum"), col("delay_minutes_sum"))

  /** Oracle twin of [[delayCube]] (FROM a `wide` CTE). */
  val delayCubeSql: String =
    delayRollupSql.replace("ROLLUP (", "CUBE (")

  /** D-ext — month-over-month movement per airline: previous-month delta
    * and a 3-month trailing mean of the mean delay. The trailing mean is
    * spelled as `(x + lag1 + lag2) / n` with explicit left-to-right
    * association rather than a windowed `avg`/decimal `sum`: a window
    * aggregate leaves summation order to the engine, and a double→decimal
    * quantization differs between engines at near-tie values (Spark
    * rounds the exact binary expansion, DuckDB scales-and-rints) — two
    * fixed-order IEEE adds are bit-identical everywhere. Nothing is
    * rounded. One shuffle on airline; the lags share one sort. */
  def momDelta(am: DataFrame): DataFrame = {
    val w = Window.partitionBy("airline_name").orderBy("month")
    val mean = col("delay_minutes_mean")
    val l1 = lag(mean, 1).over(w)
    val l2 = lag(mean, 2).over(w)
    am.select(col("airline_name"), col("month"), mean,
      (mean - l1).as("mom_delta"),
      ((mean + coalesce(l1, lit(0.0)) + coalesce(l2, lit(0.0))) /
        (lit(1) + l1.isNotNull.cast("int") + l2.isNotNull.cast("int")))
        .as("ma3"))
  }

  /** Oracle twin of [[momDelta]] (FROM an `am` CTE). */
  val momDeltaSql: String =
    s"""SELECT airline_name, month, delay_minutes_mean,
       |  delay_minutes_mean - lag(delay_minutes_mean, 1) OVER w
       |    AS mom_delta,
       |  ((delay_minutes_mean
       |      + COALESCE(lag(delay_minutes_mean, 1) OVER w, 0.0))
       |      + COALESCE(lag(delay_minutes_mean, 2) OVER w, 0.0))
       |    / (1 + CAST(lag(delay_minutes_mean, 1) OVER w IS NOT NULL
       |         AS INT)
       |         + CAST(lag(delay_minutes_mean, 2) OVER w IS NOT NULL
       |         AS INT)) AS ma3
       |FROM am
       |WINDOW w AS (PARTITION BY airline_name ORDER BY month)""".stripMargin

  /** D-ext — exact interpolated delay percentiles per airline (p50/p90/
    * p99). Spark's `percentile` is the exact linear-interpolation
    * estimator (sorts each group's values; partial aggregation still
    * applies because the buffer merges), matching DuckDB
    * `quantile_cont`. For 100 TB dashboards swap in
    * `approx_percentile` — same plan shape, bounded memory, no exact
    * oracle. Rounded to 6 so the two engines' interpolation arithmetic
    * cannot differ in the last ulp. */
  def delayPercentiles(wide: DataFrame): DataFrame =
    wide.groupBy("airline_name")
      .agg(percentile(col("delay_minutes"), lit(0.5)).as("_p50"),
        percentile(col("delay_minutes"), lit(0.9)).as("_p90"),
        percentile(col("delay_minutes"), lit(0.99)).as("_p99"))
      .select(col("airline_name"), round(col("_p50"), 6).as("p50"),
        round(col("_p90"), 6).as("p90"), round(col("_p99"), 6).as("p99"))

  /** Oracle twin of [[delayPercentiles]] (FROM a `wide` CTE). */
  val delayPercentilesSql: String =
    """SELECT airline_name,
      |  round(quantile_cont(delay_minutes, 0.5), 6) AS p50,
      |  round(quantile_cont(delay_minutes, 0.9), 6) AS p90,
      |  round(quantile_cont(delay_minutes, 0.99), 6) AS p99
      |FROM wide GROUP BY airline_name""".stripMargin

  /** D-ext — percentile outlier trim: drop each airline's delays above
    * its own p99, the standard heavy-tail trim before computing a mean
    * that is supposed to describe typical behavior. The per-group p99
    * table is airline-sized — broadcast back onto the fact scan, so the
    * trim costs one extra agg, never a fact-side shuffle. */
  def outlierTrim(wide: DataFrame): DataFrame = {
    val cuts = wide.groupBy("airline_name")
      .agg(percentile(col("delay_minutes"), lit(0.99)).as("_p99"))
    wide.join(broadcast(cuts), "airline_name")
      .where(col("delay_minutes") <= col("_p99"))
      .groupBy("airline_name")
      .agg(count(lit(1)).as("n_kept"),
        avgExact(col("delay_minutes")).as("trimmed_mean"))
  }

  /** D-ext — deterministic mode: each airline's most common origin
    * city, ties to the lexicographically smallest name. Spark's
    * `mode()` (and DuckDB's) leave ties unspecified, so the spelling
    * is a two-level agg + window rank with an explicit (count DESC,
    * city ASC) order, which both engines reproduce bit-for-bit. Two
    * partial-agg shuffles on low-cardinality keys. */
  def modeOriginCity(wide: DataFrame): DataFrame = {
    val counts = wide.groupBy("airline_name", "origin_city")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("airline_name")
      .orderBy(col("n").desc, col("origin_city").asc)
    counts.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("airline_name"), col("origin_city").as("mode_city"),
        col("n").as("n_flights"))
  }

  /** Oracle twin of [[modeOriginCity]] (FROM a `wide` CTE). */
  val modeOriginCitySql: String =
    """SELECT airline_name, origin_city AS mode_city, n AS n_flights
      |FROM (SELECT airline_name, origin_city, count(*) AS n,
      |    row_number() OVER (PARTITION BY airline_name
      |      ORDER BY count(*) DESC, origin_city ASC) AS rn
      |  FROM wide GROUP BY airline_name, origin_city) _
      |WHERE rn = 1""".stripMargin

  /** D-ext — decile assignment: airlines ranked into ntile(10) buckets
    * by mean delay (exact-decimal mean, deterministic (value, name)
    * ordering). The window is over the airline-cardinality aggregate —
    * group-count rows, never the fact table. */
  def delayDeciles(am: DataFrame): DataFrame = {
    val perAirline = am.groupBy("airline_name")
      .agg((sumExact(col("delay_minutes_mean"), 10) / count(lit(1)))
        .as("avg_delay"))
    val w = Window.orderBy(col("avg_delay").asc, col("airline_name").asc)
    perAirline.withColumn("decile", ntile(10).over(w))
  }

  /** Oracle twin of [[delayDeciles]] (FROM an `am` CTE). */
  val delayDecilesSql: String =
    s"""SELECT airline_name,
       |  ${sumExactSql("delay_minutes_mean", 10)} / COUNT(*) AS avg_delay,
       |  CAST(ntile(10) OVER (ORDER BY
       |    ${sumExactSql("delay_minutes_mean", 10)} / COUNT(*) ASC,
       |    airline_name ASC) AS INT) AS decile
       |FROM am GROUP BY airline_name""".stripMargin

  /** D-ext — exact Pearson correlation between delay minutes and the
    * line price per airline. Built-in `corr` accumulates running
    * co-moments whose float rounding depends on row order — useless
    * against a cross-engine oracle. This is the textbook expansion
    * over exact decimal sums (every Σ order-insensitive), with the
    * float arithmetic confined to one deterministic final expression:
    * `(n·Σxy − Σx·Σy) / (sqrt(n·Σx² − (Σx)²) · sqrt(n·Σy² − (Σy)²))`. */
  def delayPriceCorr(wide: DataFrame): DataFrame = {
    val x = col("delay_minutes")
    val y = col("l_extendedprice")
    val agg = wide.groupBy("airline_name").agg(
      count(lit(1)).cast("double").as("n"),
      sumExact(x, 6).as("sx"), sumExact(y, 6).as("sy"),
      sumExact(x * x, 6).as("sxx"), sumExact(y * y, 6).as("syy"),
      sumExact(x * y, 6).as("sxy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
      sqrt(col("n") * col("syy") - col("sy") * col("sy"))
    // Rounded: the Σx² decimal quantization can differ between engines
    // by 1 ulp at near-tie inputs, perturbing corr in the 16th digit.
    agg.select(col("airline_name"),
      when(den === 0, lit(null))
        .otherwise(round(num / den, 6)).as("corr_delay_price"))
  }

  /** Oracle twin of [[delayPriceCorr]] (FROM a `wide` CTE). */
  val delayPriceCorrSql: String = {
    def s6(e: String) = sumExactSql(e, 6)
    s"""SELECT airline_name,
       |  CASE WHEN (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) = 0
       |    THEN NULL
       |    ELSE round((n * sxy - sx * sy)
       |      / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) END
       |    AS corr_delay_price
       |FROM (SELECT airline_name,
       |    CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${s6("delay_minutes")} AS sx,
       |    ${s6("l_extendedprice")} AS sy,
       |    ${s6("delay_minutes * delay_minutes")} AS sxx,
       |    ${s6("l_extendedprice * l_extendedprice")} AS syy,
       |    ${s6("delay_minutes * l_extendedprice")} AS sxy
       |  FROM wide GROUP BY airline_name) _""".stripMargin
  }

  /** D-ext — Pareto concentration: airlines by delay mass, descending,
    * with each one's cumulative share of the total ("the top k carriers
    * cause X% of all delay"). Shares divide one exact decimal window
    * sum by the exact grand total, so every value is deterministic;
    * both windows run over the airline-cardinality aggregate. */
  def delayPareto(wide: DataFrame): DataFrame = {
    val perAirline = wide.groupBy("airline_name")
      .agg(sum(col("delay_minutes").cast(DecimalType(28, 6)))
        .as("delay_dec"))
    val ord = Window.orderBy(col("delay_dec").desc, col("airline_name").asc)
    val all = Window.orderBy(col("delay_dec").desc, col("airline_name").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perAirline
      .withColumn("cum_share",
        (sum("delay_dec").over(ord.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("double") /
          sum("delay_dec").over(all).cast("double")))
      .select(col("airline_name"), col("delay_dec").cast("double")
        .as("delay_minutes_sum"), col("cum_share"))
  }

  /** Oracle twin of [[delayPareto]] (FROM a `wide` CTE). */
  val delayParetoSql: String =
    """SELECT airline_name,
      |  CAST(delay_dec AS DOUBLE) AS delay_minutes_sum,
      |  CAST(SUM(delay_dec) OVER (ORDER BY delay_dec DESC, airline_name ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / CAST(SUM(delay_dec) OVER () AS DOUBLE) AS cum_share
      |FROM (SELECT airline_name,
      |    SUM(CAST(delay_minutes AS DECIMAL(28,6))) AS delay_dec
      |  FROM wide GROUP BY airline_name) _""".stripMargin

  /** Great-circle (haversine) distance in km between two lat/lon pairs
    * (degrees). Pure trig built-ins — codegen'd, no UDF; rounded where
    * emitted because libm trig may differ from StrictMath in the last
    * ulp. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column,
      lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * 6371.0088) * asin(sqrt(a))
  }

  /** SQL twin of [[haversineKm]] — identical op order. */
  def haversineKmSql(lat1: String, lon1: String, lat2: String,
      lon2: String): String =
    s"2 * 6371.0088 * asin(sqrt(pow(sin(radians($lat2 - $lat1) / 2), 2) " +
      s"+ cos(radians($lat1)) * cos(radians($lat2)) " +
      s"* pow(sin(radians($lon2 - $lon1) / 2), 2)))"

  /** D-ext — nearest other airport per airport by great-circle
    * distance: the coordinate dim self-joined (it is dimension-sized —
    * both sides broadcastable; the fact table is never touched), ranked
    * by (rounded distance, name) so the winner is engine-independent. */
  def nearestAirport(coords: DataFrame): DataFrame = {
    val a = coords.select(col("origin_city").as("city"),
      col("lat").as("lat_a"), col("lon").as("lon_a"))
    val b = coords.select(col("origin_city").as("other"),
      col("lat").as("lat_b"), col("lon").as("lon_b"))
    val w = Window.partitionBy("city")
      .orderBy(col("dist_km").asc, col("other").asc)
    a.crossJoin(broadcast(b)).where(col("city") =!= col("other"))
      .withColumn("dist_km",
        round(haversineKm(col("lat_a"), col("lon_a"),
          col("lat_b"), col("lon_b")), 6))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("city", "other", "dist_km")
  }

  /** Oracle twin of [[nearestAirport]] (over the coords VALUES list). */
  val nearestAirportSql: String =
    s"""SELECT city, other, dist_km FROM (
       |  SELECT a.origin_city AS city, b.origin_city AS other,
       |    round(${haversineKmSql("a.lat", "a.lon", "b.lat", "b.lon")}, 6)
       |      AS dist_km,
       |    row_number() OVER (PARTITION BY a.origin_city ORDER BY
       |      round(${haversineKmSql("a.lat", "a.lon", "b.lat", "b.lon")}, 6)
       |        ASC, b.origin_city ASC) AS rn
       |  FROM $coordsValuesSql AS a(origin_city, lat, lon),
       |    $coordsValuesSql AS b(origin_city, lat, lon)
       |  WHERE a.origin_city <> b.origin_city) _
       |WHERE rn = 1""".stripMargin

  /** D-ext — time-series anomaly flags: each airline-month's mean delay
    * scored against the TRAILING three months (current excluded — an
    * anomaly must not contaminate its own baseline): z = (x − m) / s
    * over the lag-1..3 window, `|z| > 2` flags. Like [[momDelta]], the
    * rolling mean/variance are spelled with fixed-order IEEE arithmetic
    * over explicit lags — windowed `avg`/`stddev` leave summation order
    * (and Welford internals) to the engine. First three months and
    * zero-variance baselines yield a null score, never a flag. */
  def delayAnomalies(am: DataFrame): DataFrame = {
    val w = Window.partitionBy("airline_name").orderBy("month")
    val x = col("delay_minutes_mean")
    val (l1, l2, l3) = (lag(x, 1).over(w), lag(x, 2).over(w), lag(x, 3).over(w))
    val m = (l1 + l2 + l3) / 3
    val s = sqrt((pow(l1 - m, 2) + pow(l2 - m, 2) + pow(l3 - m, 2)) / 2)
    val z = when(s > 0, round((x - m) / s, 6))
    am.select(col("airline_name"), col("month"), x,
      z.as("z_score"),
      when(z.isNotNull && abs(z) > 2, 1L).otherwise(0L).as("is_anomaly"))
  }

  /** Oracle twin of [[delayAnomalies]] (FROM an `am` CTE). */
  val delayAnomaliesSql: String = {
    def lg(i: Int) = s"lag(delay_minutes_mean, $i) OVER w"
    val m = s"((${lg(1)} + ${lg(2)} + ${lg(3)}) / 3)"
    val s = s"sqrt((pow(${lg(1)} - $m, 2) + pow(${lg(2)} - $m, 2) " +
      s"+ pow(${lg(3)} - $m, 2)) / 2)"
    val z = s"CASE WHEN $s > 0 THEN round((delay_minutes_mean - $m) / $s, 6) END"
    s"""SELECT airline_name, month, delay_minutes_mean,
       |  $z AS z_score,
       |  CAST(CASE WHEN $z IS NOT NULL AND abs($z) > 2
       |    THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
       |FROM am
       |WINDOW w AS (PARTITION BY airline_name ORDER BY month)""".stripMargin
  }

  /** D-ext — robust outlier detection via MAD (median absolute
    * deviation): per airline, flag delays with modified z-score
    * `|x − median| > 3 · 1.4826 · MAD`. Unlike the p99 trim
    * ([[outlierTrim]]) or a stddev rule, both location and scale are
    * 50%-breakdown robust — the outliers cannot mask themselves.
    * Two aggregation passes (median, then MAD over deviations), each
    * producing an airline-cardinality table broadcast back onto the
    * fact — the fact never shuffles. */
  def madOutliers(wide: DataFrame): DataFrame = {
    val med = wide.groupBy("airline_name")
      .agg(percentile(col("delay_minutes"), lit(0.5)).as("_med"))
    val dev = wide.join(broadcast(med), "airline_name")
      .withColumn("_adev", abs(col("delay_minutes") - col("_med")))
    val mad = dev.groupBy("airline_name")
      .agg(percentile(col("_adev"), lit(0.5)).as("_mad"),
        max("_med").as("_med2"))
    dev.join(broadcast(mad.drop("_med2")), "airline_name")
      .groupBy("airline_name")
      .agg(count(lit(1)).as("n"),
        sum(when(col("_adev") > lit(3 * 1.4826) * col("_mad"), 1L)
          .otherwise(0L)).as("n_outliers"),
        round(max("_med"), 6).as("median_delay"),
        round(max("_mad"), 6).as("mad"))
  }

  /** Oracle twin of [[madOutliers]] (FROM a `wide` CTE; subqueries so it
    * composes under `withWide`). */
  val madOutliersSql: String =
    """SELECT airline_name, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN adev > 3 * 1.4826 * _mad THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers,
      |  round(max(_med), 6) AS median_delay,
      |  round(max(_mad), 6) AS mad
      |FROM (
      |  SELECT d.airline_name, d.adev, d._med, m._mad
      |  FROM (SELECT w.airline_name,
      |      abs(w.delay_minutes - c._med) AS adev, c._med
      |    FROM wide w JOIN (SELECT airline_name,
      |        quantile_cont(delay_minutes, 0.5) AS _med
      |      FROM wide GROUP BY airline_name) c USING (airline_name)) d
      |  JOIN (SELECT w.airline_name,
      |      quantile_cont(abs(w.delay_minutes - c._med), 0.5) AS _mad
      |    FROM wide w JOIN (SELECT airline_name,
      |        quantile_cont(delay_minutes, 0.5) AS _med
      |      FROM wide GROUP BY airline_name) c USING (airline_name)
      |    GROUP BY w.airline_name) m USING (airline_name)) _
      |GROUP BY airline_name""".stripMargin

  /** Oracle twin of [[outlierTrim]] (FROM a `wide` CTE; subquery rather
    * than a second CTE so it composes under the `withWide` wrapper). */
  val outlierTrimSql: String =
    s"""SELECT airline_name, COUNT(*) AS n_kept,
       |  ${avgExactSql("delay_minutes")} AS trimmed_mean
       |FROM wide JOIN (SELECT airline_name,
       |    quantile_cont(delay_minutes, 0.99) AS _p99
       |  FROM wide GROUP BY airline_name) cuts USING (airline_name)
       |WHERE delay_minutes <= _p99
       |GROUP BY airline_name""".stripMargin

  /** Time-series resample: aggregate an event-grain input to a DENSE
    * per-key monthly series over the global observed month range, gaps
    * filled by last observation carried forward (LOCF). Months before a
    * key's first observation stay NULL (there is nothing to carry).
    *
    * Scale shape: the fact is touched exactly once (the monthly partial/
    * final aggregate); the spine is dims-only — distinct keys cross-joined
    * with the broadcast month axis (|keys|·|months| rows, never
    * fact-sized) — and the fill window sorts each key's |months| rows on
    * its own reducer. `measure` must be deterministic ([[sumExact]]-style)
    * for the filled series to be reproducible. */
  def monthlyLocf(df: DataFrame, keyCol: String, tsCol: String,
      measure: Column, outCol: String): DataFrame = {
    val monthly = df
      .groupBy(col(keyCol), date_trunc("month", col(tsCol)).as("_m"))
      .agg(measure.as("_v"))
    val months = monthly.agg(min("_m").as("lo"), max("_m").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 month"))).as("_m"))
    val w = Window.partitionBy(keyCol).orderBy("_m")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol)).distinct()
      .crossJoin(broadcast(months))
      .join(monthly, Seq(keyCol, "_m"), "left")
      .select(col(keyCol), date_format(col("_m"), "yyyy-MM").as("month"),
        last("_v", ignoreNulls = true).over(w).as(outCol))
  }

  /** D-ext — per-group simple linear regression (the dashboard trend
    * line, fitted rather than eyeballed): least-squares slope and
    * intercept of `delay_minutes` over the flight date (days since
    * epoch), per airline.
    *
    * Same determinism discipline as [[delayPriceCorr]]: one partial/final
    * aggregate computes the five moment sums as exact decimals
    * ([[sumExact]] — order-independent across any partitioning), the
    * closed-form slope/intercept divide on the driver-free final
    * projection, and the result rounds to 6 so both engines quantize
    * identically. One fact scan, group-cardinality output; at 100 TB
    * this is the same two-phase hash-agg shape as q02. */
  def delayTrendFit(wide: DataFrame): DataFrame = {
    val x = datediff(col("date_key"), lit("1970-01-01")).cast("double")
    val y = col("delay_minutes")
    val agg = wide.groupBy("airline_name").agg(
      count(lit(1)).cast("double").as("n"),
      sumExact(x, 6).as("sx"), sumExact(y, 6).as("sy"),
      sumExact(x * x, 6).as("sxx"), sumExact(x * y, 6).as("sxy"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) / den
    agg.select(col("airline_name"),
      col("n").cast("long").as("n"),
      when(den === 0, lit(null)).otherwise(round(slope, 6)).as("slope"),
      when(den === 0, lit(null))
        .otherwise(round((col("sy") - slope * col("sx")) / col("n"), 6))
        .as("intercept"))
  }

  /** Oracle twin of [[delayTrendFit]] (FROM a `wide` CTE) — the same
    * decimal moment sums and closed form, NOT DuckDB's `regr_slope`
    * (whose streaming co-moment order differs from the two-phase merge,
    * perturbing low-order bits). */
  val delayTrendFitSql: String = {
    def s6(e: String) = sumExactSql(e, 6)
    s"""SELECT airline_name, CAST(n AS BIGINT) AS n,
       |  CASE WHEN (n * sxx - sx * sx) = 0 THEN NULL
       |    ELSE round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) END
       |    AS slope,
       |  CASE WHEN (n * sxx - sx * sx) = 0 THEN NULL
       |    ELSE round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
       |      / n, 6) END AS intercept
       |FROM (SELECT airline_name,
       |    CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${s6("CAST(date_key - DATE '1970-01-01' AS DOUBLE)")} AS sx,
       |    ${s6("delay_minutes")} AS sy,
       |    ${s6("CAST(date_key - DATE '1970-01-01' AS DOUBLE) * " +
             "CAST(date_key - DATE '1970-01-01' AS DOUBLE)")} AS sxx,
       |    ${s6("CAST(date_key - DATE '1970-01-01' AS DOUBLE) * delay_minutes")}
       |      AS sxy
       |  FROM wide GROUP BY airline_name) _""".stripMargin
  }

  /** Oracle twin of [[monthlyLocf]] — identical spine + `IGNORE NULLS`
    * running last over the left join. */
  def monthlyLocfSql(from: String, key: String, ts: String,
      measureSql: String, outCol: String): String =
    s"""WITH monthly AS (
       |  SELECT $key AS k, date_trunc('month', $ts) AS m, $measureSql AS v
       |  FROM $from GROUP BY 1, 2),
       |months AS (
       |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS m
       |  FROM (SELECT min(m) AS lo, max(m) AS hi FROM monthly)),
       |spine AS (
       |  SELECT k, m FROM (SELECT DISTINCT $key AS k FROM $from), months)
       |SELECT s.k AS $key, strftime(s.m, '%Y-%m') AS month,
       |  last_value(mo.v IGNORE NULLS) OVER (PARTITION BY s.k ORDER BY s.m
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS $outCol
       |FROM spine s LEFT JOIN monthly mo ON s.k = mo.k AND s.m = mo.m""".stripMargin
}
