package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's ACTUAL flight schema, wired end to end: raw monthly
  * CSV → cleaned fact → star dims → denormalized wide view → the two
  * cache tables the dashboard reads (`airline_monthly_performance`,
  * `airport_performance`). The TPC-H restatement (q01–q21) proves each
  * operator's semantics against a DuckDB oracle; THIS module proves the
  * flight-schema wiring itself, so a user holding the reference's input
  * files can run the same pipeline unchanged (GoldenPipelineSpec drives
  * it against the reference's published output shapes).
  *
  * Sources: column contract and cleaning semantics from
  * `/root/reference/src/data_cleaning.py:15-64,103`; star modeling from
  * `/root/reference/sql/data_modeling.sql`; wide view from
  * `/root/reference/sql/wide_table.sql:4-36`; aggregation from
  * `/root/reference/src/aggregate_flight_data.py:18-79`.
  *
  * Scale notes. Cleaning is pure `Column` builders (whole-stage
  * codegen, no UDFs); dims are DISTINCT builds over the fact (one
  * shuffle each, tiny results) and join back broadcast, so the wide
  * view costs zero fact shuffles; both caches are single hash
  * aggregations whose partial/final split Spark plans automatically —
  * the reference's hand-rolled 200k-row chunk loop
  * (`aggregate_flight_data.py:26-37`) is exactly a manual map-side
  * combine. Measures aggregate as float64 (pandas parity); the
  * production twins (q02/q03) show the exact-decimal variant.
  */
object FlightPipeline {

  /** The five delay-cause columns (`data_cleaning.py:31`). */
  val delayCauseCols: Seq[String] = Seq("CarrierDelay", "WeatherDelay",
    "NASDelay", "SecurityDelay", "LateAircraftDelay")

  /** The 29-column keep list (`data_cleaning.py:15-22`); `Cancelled` is
    * additionally read when the extract has it (`:25`). */
  val keepCols: Seq[String] = Seq(
    "Year", "Quarter", "Month", "DayofMonth", "DayOfWeek", "FlightDate",
    "Reporting_Airline", "Tail_Number", "Flight_Number_Reporting_Airline",
    "Origin", "OriginCityName", "OriginState",
    "Dest", "DestCityName", "DestState",
    "CRSDepTime", "DepTime", "DepDelay", "DepDelayMinutes", "DepDel15",
    "DepTimeBlk", "ActualElapsedTime", "AirTime", "Distance") ++
    delayCauseCols

  /** Pinned CSV schema of a raw monthly extract — never schema-infer at
    * scale (an extra full pass, and per-file type drift). */
  def rawSchema(includeCancelled: Boolean): StructType = {
    val base = StructType(Seq(
      StructField("Year", IntegerType), StructField("Quarter", IntegerType),
      StructField("Month", IntegerType), StructField("DayofMonth", IntegerType),
      StructField("DayOfWeek", IntegerType), StructField("FlightDate", DateType),
      StructField("Reporting_Airline", StringType),
      StructField("Tail_Number", StringType),
      StructField("Flight_Number_Reporting_Airline", IntegerType),
      StructField("Origin", StringType), StructField("OriginCityName", StringType),
      StructField("OriginState", StringType),
      StructField("Dest", StringType), StructField("DestCityName", StringType),
      StructField("DestState", StringType),
      StructField("CRSDepTime", IntegerType), StructField("DepTime", IntegerType),
      StructField("DepDelay", DoubleType),
      StructField("DepDelayMinutes", DoubleType),
      StructField("DepDel15", DoubleType), StructField("DepTimeBlk", StringType),
      StructField("ActualElapsedTime", DoubleType),
      StructField("AirTime", DoubleType), StructField("Distance", DoubleType)) ++
      delayCauseCols.map(StructField(_, DoubleType)))
    if (includeCancelled) base.add(StructField("Cancelled", DoubleType))
    else base
  }

  /** `clean_airline_data` + the main loop's `Is_Weekend`
    * (`data_cleaning.py:15-64,103`), composed from the [[Cleaning]]
    * builders: column whitelist, date cast, delay-cause NULL→0, HHMM →
    * "HH:MM" (2400 wraps; NULL DepTime stays NULL), delay-measure
    * NULL→0, cancelled flag with the schema branch (explicit
    * `Cancelled` when present, else inferred from NULL elapsed time). */
  def cleanFlights(raw: DataFrame): DataFrame = {
    val present = raw.columns.toSet
    val kept = raw.select(
      (keepCols.filter(present) ++ Seq("Cancelled").filter(present))
        .map(col): _*)
    val filled = delayCauseCols.filter(present)
      .foldLeft(kept.withColumn("FlightDate", col("FlightDate").cast("date"))) {
        (df, c) => df.withColumn(c, Cleaning.fillZero(col(c)))
      }
    filled
      .withColumn("CRSDepTime", Cleaning.formatHHMM(col("CRSDepTime")))
      .withColumn("DepTime", Cleaning.formatHHMMIfPresent(col("DepTime")))
      .withColumn("DepDelay", Cleaning.fillZero(col("DepDelay")))
      .withColumn("DepDelayMinutes", Cleaning.fillZero(col("DepDelayMinutes")))
      .withColumn("DepDel15", Cleaning.fillZero(col("DepDel15")))
      .withColumn("Is_Cancelled", Cleaning.cancelledFlag(
        if (present("Cancelled")) Some(col("Cancelled")) else None,
        col("ActualElapsedTime")))
      .withColumn("Is_Weekend", Cleaning.isWeekend(col("DayOfWeek")))
      .drop("Cancelled")
  }

  /** `dim_airports` — UNION-distinct of the origin and destination legs
    * (`data_modeling.sql:12-16`): an airport appearing only as a
    * destination still gets a dim row, and one appearing as both
    * collapses to one. */
  def dimAirports(cleaned: DataFrame): DataFrame =
    cleaned.select(col("Origin").as("airport_code"),
        col("OriginCityName").as("city_name"),
        col("OriginState").as("state_code"))
      .union(cleaned.select(col("Dest"), col("DestCityName"),
        col("DestState")))
      .distinct()

  /** `dim_calendar` (`data_modeling.sql:30-45`): one row per flown
    * date, carrying the derivable date parts. */
  def dimCalendar(cleaned: DataFrame): DataFrame =
    cleaned.select(col("FlightDate").as("date_key"), col("Year").as("year"),
        col("Quarter").as("quarter"), col("Month").as("month"),
        col("DayofMonth").as("day_of_month"),
        col("DayOfWeek").as("day_of_week"),
        col("Is_Weekend").as("is_weekend"))
      .distinct()

  /** `v_flight_performance_analysis` (`wide_table.sql:4-36`): the fact
    * LEFT-joined to airlines (code → display name), origin/dest
    * airports (role-playing dim, joined twice), and the calendar. All
    * dims broadcast — the wide view shuffles the fact zero times.
    * `airlineNames` is the reference's manually-loaded code→name map as
    * a two-column frame (airline_code, airline_name). */
  def wideView(cleaned: DataFrame, airlineNames: DataFrame): DataFrame = {
    val airports = dimAirports(cleaned)
    val cal = dimCalendar(cleaned)
    cleaned
      // The calendar supplies the date parts in the wide view
      // (wide_table.sql:7-9); the fact's own copies would collide with
      // them under Spark's case-insensitive resolution.
      .drop("Month", "DayOfWeek", "Is_Weekend")
      .join(broadcast(airlineNames.withColumnRenamed("airline_code",
        "Reporting_Airline")), Seq("Reporting_Airline"), "left")
      .join(broadcast(airports.select(
        col("airport_code").as("Origin"),
        col("city_name").as("origin_city"),
        col("state_code").as("origin_state"))), Seq("Origin"), "left")
      .join(broadcast(airports.select(
        col("airport_code").as("Dest"),
        col("city_name").as("dest_city"))), Seq("Dest"), "left")
      .join(broadcast(cal.select(col("date_key").as("FlightDate"),
        col("month"), col("day_of_week"), col("is_weekend"))),
        Seq("FlightDate"), "left")
      .select(col("FlightDate").as("date_key"), col("month"),
        col("day_of_week"), col("is_weekend"), col("airline_name"),
        col("Reporting_Airline").as("airline_code"), col("origin_city"),
        col("origin_state"), col("dest_city"),
        col("DepDelayMinutes"), col("DepDel15"), col("Is_Cancelled"),
        col("CarrierDelay"), col("WeatherDelay"), col("NASDelay"),
        col("SecurityDelay"), col("LateAircraftDelay"))
  }

  /** `airline_monthly_performance` (`aggregate_flight_data.py:18-43`)
    * with the reference's exact output column names. One hash
    * aggregation; Spark's partial/final split IS the reference's manual
    * chunk-combine. Deliberate divergence (SURVEY §2.D quirk Q1): the
    * reference's cross-chunk combine SUMS per-chunk means for
    * `DepDelayMinutes_mean` (`:37` — `.groupby(level).sum()` over a
    * mean column), silently inflating the stat by the chunk count; this
    * computes the true mean. */
  def airlineMonthly(wide: DataFrame): DataFrame =
    // pandas groupby drops NaN-keyed groups (dropna=True default), so a
    // carrier code missing from the airline-name map never reaches
    // `airline_monthly_performance`; Spark keeps NULL groups — filter
    // to match, or an unmapped code would add a null-airline row the
    // reference pipeline never emits.
    wide.filter(col("airline_name").isNotNull && col("month").isNotNull)
      .groupBy("airline_name", "month")
      .agg(count(col("DepDel15")).as("DepDel15_count"),
        sum(col("DepDel15")).as("DepDel15_sum"),
        avg(col("DepDelayMinutes")).as("DepDelayMinutes_mean"),
        sum(col("Is_Cancelled")).as("Is_Cancelled_sum"),
        sum(col("CarrierDelay")).as("CarrierDelay_sum"),
        sum(col("WeatherDelay")).as("WeatherDelay_sum"),
        sum(col("NASDelay")).as("NASDelay_sum"),
        sum(col("LateAircraftDelay")).as("LateAircraftDelay_sum"))
      .withColumn("on_time_rate",
        Cleaning.onTimeRate(col("DepDel15_sum"), col("DepDel15_count")))

  /** The reference's 12-entry city→(lat,lon) literal lookup
    * (`aggregate_flight_data.py:65-72`; public airport coordinates). */
  val cityCoords: Seq[(String, Double, Double)] = Seq(
    ("Atlanta, GA", 33.6407, -84.4277), ("Chicago, IL", 41.9742, -87.9073),
    ("Dallas/Fort Worth, TX", 32.8998, -97.0403),
    ("Denver, CO", 39.8561, -104.6737),
    ("San Francisco, CA", 37.6213, -122.3790),
    ("New York, NY", 40.6413, -73.7781),
    ("Los Angeles, CA", 33.9416, -118.4085),
    ("Seattle, WA", 47.4502, -122.3088),
    ("Houston, TX", 29.9804, -95.3397), ("Phoenix, AZ", 33.4342, -112.0081),
    ("Las Vegas, NV", 36.0840, -115.1537),
    ("Charlotte, NC", 35.2140, -80.9431))

  def coordsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    cityCoords.toDF("origin_city", "lat", "lon")
  }

  /** `airport_performance` (`aggregate_flight_data.py:51-79`), exact
    * output column names/order: the airline×month×city rollup, then the
    * coordinate lookup as an inner broadcast join — reproducing
    * `.map(coords.get)` + `dropna` (unmapped cities leave the table). */
  def airportPerformance(wide: DataFrame, coords: DataFrame): DataFrame =
    Aggregates.withCoords(
      // Same pandas dropna-group semantics as [[airlineMonthly]].
      wide.filter(col("airline_name").isNotNull && col("month").isNotNull &&
          col("origin_city").isNotNull)
        .groupBy("airline_name", "month", "origin_city")
        .agg(count(lit(1)).as("total_flights"),
          sum(col("DepDel15")).as("delayed_flights")),
      coords)
      .select("airline_name", "month", "origin_city", "total_flights",
        "delayed_flights", "lat", "lon")
}
