package graft

import org.apache.spark.sql.functions._

import graft.engine.{StarSchema, Tables}

class StarSchemaSpec extends SparkSpec {

  test("wide view preserves fact cardinality (left joins to unique-key dims)") {
    val nLineitem = Tables.lineitem(spark, sf).count()
    assert(StarSchema.wideView(spark, sf).count() == nLineitem)
  }

  test("role-playing nation dim resolves both origin and dest roles") {
    val w = StarSchema.wideView(spark, sf)
    assert(w.filter(col("origin_city").isNull || col("dest_city").isNull).count() == 0)
    // origin comes through customer, dest through supplier — they must be
    // allowed to differ on the same row (the role-playing property).
    assert(w.filter(col("origin_city") =!= col("dest_city")).count() > 0)
  }

  test("dimAirports dedups nations appearing in both roles (UNION semantics)") {
    val dim = StarSchema.dimAirports(spark, sf)
    assert(dim.count() == dim.select("airport_key").distinct().count())
  }

  test("dimCalendar has one row per distinct date, iso dow in 1..7") {
    val cal = StarSchema.dimCalendar(spark, sf).cache()
    assert(cal.count() == cal.select("date_key").distinct().count())
    assert(cal.filter(col("day_of_week") < 1 || col("day_of_week") > 7).count() == 0)
    assert(cal.filter(col("is_weekend") === 1).count() > 0)
    cal.unpersist()
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
