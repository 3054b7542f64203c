package graft

import org.apache.spark.sql.functions._

import graft.engine.{FlightPipeline, Ingest}

/** The golden flight-pipeline test (SURVEY §5 item B): a synthetic mini
  * flight CSV with every documented edge row runs through
  * Ingest → cleanFlights → dims/wide view → the two cache aggregations,
  * and the outputs are held against the reference's OWN materialized
  * artifacts — `/root/reference/airline_monthly_performance.csv` (42
  * rows) and `/root/reference/airport_performance.csv` (399 rows) — for
  * exact column sets and shape invariants, with values re-derived on
  * the fixture (the reference's raw 1.6M-row input is not shipped, so
  * value parity is pinned on the mini fixture plus formula re-derivation
  * over the golden rows themselves). */
class GoldenPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val refAirlineCsv = "/root/reference/airline_monthly_performance.csv"
  private val refAirportCsv = "/root/reference/airport_performance.csv"

  /** The mini fixture (FIXTURES.md §B): 8 rows, 2 airlines, 2 months,
    * 3 cities, covering 2400-wrap, NULL DepTime, all-cause-NULL fill,
    * weekend boundary 5/6/7, a coord-less city, a same-airport
    * origin+dest dedup, and a group wide enough to split into "chunks"
    * for the quirk-Q1 demonstration. Column order = rawSchema. */
  private def csvLines(includeCancelled: Boolean): Seq[String] = {
    val header = FlightPipeline.rawSchema(includeCancelled = true)
      .fieldNames.toSeq
    // (M, DoW, date, code, tail, origin, oCity, oSt, dest, dCity, dSt,
    //  dep, delayMin, del15, elapsed, carrier, weather, nas, sec, late, cancelled)
    val rows = Seq(
      // r1: DepTime 2400 → "00:00"; carrier-cause delay; weekday 5 (not weekend)
      (1, 5, "2025-01-03", "AA", "ATL", "Atlanta, GA", "GA", "ORD", "Chicago, IL", "IL", "2400", "20.0", "1.0", "120.0", "20.0", "", "", "", "", "0.0"),
      // r2: cancelled — NULL DepTime stays NULL, NULL measures fill to 0, Saturday
      (1, 6, "2025-01-04", "AA", "ATL", "Atlanta, GA", "GA", "ORD", "Chicago, IL", "IL", "", "", "", "", "", "", "", "", "", "1.0"),
      // r3: Sunday; dest ATL = same airport as r1's origin (dim dedup edge)
      (1, 7, "2025-01-05", "AA", "ORD", "Chicago, IL", "IL", "ATL", "Atlanta, GA", "GA", "0915", "0.0", "0.0", "110.0", "", "", "", "", "", "0.0"),
      // r4: city with no coordinate entry → dropped from airport_performance
      (2, 1, "2025-02-03", "AA", "SLV", "Smallville, KS", "KS", "ATL", "Atlanta, GA", "GA", "0700", "30.0", "1.0", "95.0", "", "30.0", "", "", "", "0.0"),
      // r5+r6: one (airline,month,city) group spanning two "chunks" (quirk Q1)
      (2, 2, "2025-02-04", "AA", "ATL", "Atlanta, GA", "GA", "ORD", "Chicago, IL", "IL", "0810", "10.0", "0.0", "100.0", "", "", "", "", "", "0.0"),
      (2, 3, "2025-02-05", "AA", "ATL", "Atlanta, GA", "GA", "ORD", "Chicago, IL", "IL", "0820", "20.0", "1.0", "100.0", "", "", "20.0", "", "", "0.0"),
      // r7: second airline
      (1, 4, "2025-01-09", "BB", "ATL", "Atlanta, GA", "GA", "ORD", "Chicago, IL", "IL", "0905", "5.0", "0.0", "80.0", "", "", "", "", "", "0.0"),
      // r8: NAS + late-aircraft causes
      (2, 5, "2025-02-06", "BB", "ORD", "Chicago, IL", "IL", "ATL", "Atlanta, GA", "GA", "0130", "45.0", "1.0", "130.0", "", "", "45.0", "", "10.0", "0.0"))
    val lines = rows.zipWithIndex.map { case ((m, dow, date, code, o, oc,
        os, d, dc, ds, dep, dmin, d15, elapsed, ca, we, na, se, la, can), i) =>
      val full = Map(
        "Year" -> "2025", "Quarter" -> "1", "Month" -> m.toString,
        "DayofMonth" -> date.takeRight(2), "DayOfWeek" -> dow.toString,
        "FlightDate" -> date, "Reporting_Airline" -> code,
        "Tail_Number" -> s"N$i", "Flight_Number_Reporting_Airline" -> s"${100 + i}",
        "Origin" -> o, "OriginCityName" -> s""""$oc"""", "OriginState" -> os,
        "Dest" -> d, "DestCityName" -> s""""$dc"""", "DestState" -> ds,
        "CRSDepTime" -> "0800", "DepTime" -> dep, "DepDelay" -> dmin,
        "DepDelayMinutes" -> dmin, "DepDel15" -> d15,
        "DepTimeBlk" -> "0800-0859", "ActualElapsedTime" -> elapsed,
        "AirTime" -> elapsed, "Distance" -> "500.0",
        "CarrierDelay" -> ca, "WeatherDelay" -> we, "NASDelay" -> na,
        "SecurityDelay" -> se, "LateAircraftDelay" -> la,
        "Cancelled" -> can)
      val cols = if (includeCancelled) header else header.filter(_ != "Cancelled")
      cols.map(full).mkString(",")
    }
    val cols = if (includeCancelled) header else header.filter(_ != "Cancelled")
    cols.mkString(",") +: lines
  }

  private def writeFixture(includeCancelled: Boolean): String = {
    val tag = if (includeCancelled) "with-cancelled" else "no-cancelled"
    val path = s"${graft.engine.Sinks.scratch}/golden-flights-$tag/part.csv"
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(f)
    try csvLines(includeCancelled).foreach(w.println) finally w.close()
    path
  }

  private lazy val cleaned = FlightPipeline.cleanFlights(Ingest.readCsv(
    spark, Seq(writeFixture(includeCancelled = true)),
    FlightPipeline.rawSchema(includeCancelled = true)))

  private lazy val airlineNames =
    Seq(("AA", "Alpha Air"), ("BB", "Beta Blue"))
      .toDF("airline_code", "airline_name")

  private lazy val wide = FlightPipeline.wideView(cleaned, airlineNames)

  private def refHeader(path: String): Seq[String] = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().next().split(",").toSeq finally src.close()
  }

  private def refRowCount(path: String): Int = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().size - 1 finally src.close()
  }

  test("cleaning pins every reference edge: 2400 wrap, NULL DepTime, cause fill, weekend boundary") {
    val byTail = cleaned
      .select("Tail_Number", "DepTime", "CRSDepTime", "CarrierDelay",
        "WeatherDelay", "NASDelay", "SecurityDelay", "LateAircraftDelay",
        "DepDelayMinutes", "DepDel15", "Is_Cancelled", "Is_Weekend")
      .collect().map(r => r.getString(0) -> r).toMap
    // r1 (N0): DepTime 2400 wraps to "00:00" (data_cleaning.py:40)
    assert(byTail("N0").getString(1) == "00:00")
    assert(byTail("N0").getString(2) == "08:00")
    // r2 (N1): cancelled — DepTime stays NULL (:51-53); measures fill 0;
    // all five causes fill 0 (:31-34); explicit Cancelled honored (:62)
    assert(byTail("N1").isNullAt(1))
    (3 to 9).foreach(i => assert(byTail("N1").getDouble(i) == 0.0,
      s"col $i of the cancelled row must fill to 0"))
    assert(byTail("N1").getInt(10) == 1)
    // weekend boundary at DayOfWeek >= 6 (:103): Fri no, Sat/Sun yes
    assert(byTail("N0").getInt(11) == 0)
    assert(byTail("N1").getInt(11) == 1)
    assert(byTail("N2").getInt(11) == 1)
  }

  test("schema branch: absent Cancelled column infers the flag from NULL elapsed time") {
    val noCancelled = FlightPipeline.cleanFlights(Ingest.readCsv(
      spark, Seq(writeFixture(includeCancelled = false)),
      FlightPipeline.rawSchema(includeCancelled = false)))
    // Identical output schema either way (the branch is plan-time)...
    assert(noCancelled.columns.toSeq == cleaned.columns.toSeq)
    // ...and on this fixture identical values: Cancelled=1 exactly where
    // ActualElapsedTime is NULL (data_cleaning.py:61-64).
    val a = cleaned.orderBy("Tail_Number").collect().toSeq
    val b = noCancelled.orderBy("Tail_Number").collect().toSeq
    assert(a == b)
  }

  test("dim_airports union-dedups the role-playing legs (ATL appears once)") {
    val dim = FlightPipeline.dimAirports(cleaned)
      .as[(String, String, String)].collect().toSet
    assert(dim == Set(("ATL", "Atlanta, GA", "GA"),
      ("ORD", "Chicago, IL", "IL"), ("SLV", "Smallville, KS", "KS")))
  }

  test("airline_monthly_performance: exact reference column set, re-derived values, quirk Q1 documented") {
    val am = FlightPipeline.airlineMonthly(wide)
    // Column parity with the reference's own golden artifact.
    assert(am.columns.toSeq == refHeader(refAirlineCsv),
      s"cache-table columns diverge from $refAirlineCsv")
    val got = am.as[(String, Int, Long, Double, Double, Long, Double,
      Double, Double, Double, Double)].collect().toSet
    // Hand-derived from the fixture. DepDelayMinutes_mean is the TRUE
    // mean — quirk Q1: the reference's chunked combine would report
    // 10.0 + 20.0 = 30.0 for (Alpha Air, 2) if r5 and r6 landed in
    // different chunks (aggregate_flight_data.py:37 sums per-chunk
    // means); the correct value is 20.0 and that is what we ship.
    assert(got == Set(
      ("Alpha Air", 1, 3L, 1.0, 20.0 / 3, 1L, 20.0, 0.0, 0.0, 0.0, 1.0 - 1.0 / 3),
      ("Alpha Air", 2, 3L, 2.0, 20.0, 0L, 0.0, 30.0, 20.0, 0.0, 1.0 - 2.0 / 3),
      ("Beta Blue", 1, 1L, 0.0, 5.0, 0L, 0.0, 0.0, 0.0, 0.0, 1.0),
      ("Beta Blue", 2, 1L, 1.0, 45.0, 0L, 0.0, 0.0, 45.0, 10.0, 0.0)))
  }

  test("airport_performance: exact reference column set, coord dropna, re-derived values") {
    val ap = FlightPipeline.airportPerformance(
      wide, FlightPipeline.coordsDf(spark))
    assert(ap.columns.toSeq == refHeader(refAirportCsv),
      s"cache-table columns diverge from $refAirportCsv")
    val got = ap.as[(String, Int, String, Long, Double, Double, Double)]
      .collect().toSet
    // Smallville (no coords entry) is dropped — the .map()+dropna edge.
    assert(got == Set(
      ("Alpha Air", 1, "Atlanta, GA", 2L, 1.0, 33.6407, -84.4277),
      ("Alpha Air", 1, "Chicago, IL", 1L, 0.0, 41.9742, -87.9073),
      ("Alpha Air", 2, "Atlanta, GA", 2L, 1.0, 33.6407, -84.4277),
      ("Beta Blue", 1, "Atlanta, GA", 1L, 0.0, 33.6407, -84.4277),
      ("Beta Blue", 2, "Chicago, IL", 1L, 1.0, 41.9742, -87.9073)))
  }

  test("reference golden shapes: 42-row airline cache = complete 14x3 grid; 399-row airport cache") {
    assert(refRowCount(refAirlineCsv) == 42)
    assert(refRowCount(refAirportCsv) == 399)
    val ref = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(refAirlineCsv)
    val airlines = ref.select("airline_name").distinct().count()
    val months = ref.select("month").distinct().count()
    assert(airlines == 14 && months == 3,
      s"grid: $airlines airlines x $months months")
    assert(ref.count() == airlines * months, "grid must be complete")
  }

  test("formula re-derivation over the golden rows: on_time_rate = 1 - sum/count; coords match the dict") {
    // Our on-time-rate formula reproduces every golden row of the
    // reference's own artifact to FP tolerance.
    val ref = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(refAirlineCsv)
    val bad = ref.withColumn("derived",
        lit(1.0) - col("DepDel15_sum") / col("DepDel15_count"))
      .filter(abs(col("derived") - col("on_time_rate")) > 1e-9)
    assert(bad.count() == 0, "on_time_rate formula diverges from golden rows")
    // Every golden airport row's (lat, lon) equals our literal dim's
    // entry for its city — the 12-entry lookup is faithfully carried.
    val coords = FlightPipeline.cityCoords
      .map { case (c, la, lo) => c -> (la, lo) }.toMap
    val refAp = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(refAirportCsv)
      .select("origin_city", "lat", "lon")
      .as[(String, Double, Double)].collect()
    refAp.foreach { case (city, la, lo) =>
      assert(coords.get(city).contains((la, lo)),
        s"golden city $city coords ($la,$lo) not in the literal dim") }
    // No duplicate grouping keys in the golden airport cache.
    val dup = refAp.length
    assert(spark.read.option("header", "true").csv(refAirportCsv)
      .select("airline_name", "month", "origin_city").distinct()
      .count() == dup)
  }
}
