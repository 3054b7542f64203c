package graft

import org.apache.spark.sql.functions._

import graft.sources.Jdbc

/** The A2/A4 JDBC boundary end-to-end against embedded Derby: dialect
  * DDL, batched inserts, replace/append modes, partitioned range reads.
  * Derby stands in for the reference's MySQL — same Spark call sites. */
class JdbcSpec extends SparkSpec {

  private val url = Jdbc.derbyMemUrl("graft_test")

  test("A4 replace/append chunked write + A2 partitioned read roundtrip") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i, s"name_$i", i * 1.5, i.toLong * 10))
      .toDF("id", "label", "score", "total")
    // The reference's chunk loop: first chunk replaces, the rest append
    // (/root/reference/src/data_cleaning.py:108-116).
    Jdbc.writeVarchar(df.filter(col("id") <= 40), url, "t_roundtrip",
      "overwrite", Jdbc.derbyProps(), batchSize = 16)
    Jdbc.writeVarchar(df.filter(col("id") > 40), url, "t_roundtrip",
      "append", Jdbc.derbyProps(), batchSize = 16)
    val back = Jdbc.readPartitioned(spark, url, "t_roundtrip",
      partitionColumn = "id", lower = 1L, upper = 100L,
      numPartitions = 4, Jdbc.derbyProps())
    // The partitioned scan is genuinely parallel: one range cursor each.
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
    // Values (including doubles) roundtrip bit-exactly.
    assert(back.except(df).count() == 0)
    assert(df.except(back).count() == 0)
  }

  test("overwrite really replaces: a second write drops the first table") {
    import spark.implicits._
    Jdbc.writeVarchar(Seq((1, "old")).toDF("id", "v"), url, "t_replace",
      "overwrite", Jdbc.derbyProps())
    Jdbc.writeVarchar(Seq((2, "new"), (3, "new")).toDF("id", "v"), url,
      "t_replace", "overwrite", Jdbc.derbyProps())
    val back = Jdbc.read(spark, url, "t_replace", Jdbc.derbyProps())
    assert(back.count() == 2)
    assert(back.filter(col("v") === "old").count() == 0)
  }

  test("A3: aggregate pushdown through the DSv2 JDBC catalog") {
    import spark.implicits._
    // The reference's A3 is `read_sql` of a GROUP BY — the aggregation
    // executes inside MySQL. Spark's DSv2 JDBC catalog reproduces that
    // boundary for real: with pushDownAggregate, the partial aggregation
    // is compiled INTO the source query and the database returns
    // pre-aggregated rows (visible as PushedAggregates in the scan).
    val df = (1 to 60).map(i => (i, i % 5, i * 2.0)).toDF("id", "grp", "x")
    Jdbc.writeVarchar(df, url, "t_agg", "overwrite", Jdbc.derbyProps())
    spark.conf.set("spark.sql.catalog.derby",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.derby.url", url)
    spark.conf.set("spark.sql.catalog.derby.driver",
      "org.apache.derby.jdbc.EmbeddedDriver")
    spark.conf.set("spark.sql.catalog.derby.pushDownAggregate", "true")
    try {
      // Derby stores unquoted identifiers uppercase and the DSv2 catalog
      // quotes exactly what it is given — reference the table as T_AGG.
      val agg = spark.sql(
        "SELECT grp, count(*) AS n, sum(x) AS sx FROM derby.APP.T_AGG GROUP BY grp")
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregates"), plan)
      val got = agg.orderBy("grp").collect()
      val want = df.groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"))
        .orderBy("grp").collect()
      assert(got.sameElements(want))
    } finally spark.conf.unset("spark.sql.catalog.derby")
  }

  test("filters and projections push into the partitioned scan") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i, s"v$i", i % 7)).toDF("id", "v", "bucket")
    Jdbc.writeVarchar(df, url, "t_pushdown", "overwrite", Jdbc.derbyProps())
    val q = Jdbc.readPartitioned(spark, url, "t_pushdown", "id", 1L, 50L, 3,
        Jdbc.derbyProps())
      .filter(col("bucket") === 2).select("id", "bucket")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("bucket"), plan)
    assert(q.count() == df.filter(col("bucket") === 2).count())
  }
}
