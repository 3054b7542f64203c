package graft.tmp
import org.apache.spark.sql.SparkSession
object Probe {
  def main(a: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = s.read.parquet("/root/testdata/sf0.01/events.parquet")
    df.printSchema()
    df.selectExpr("event_id","ts","timestamp_micros(ts div 1000) AS tsm")
      .orderBy("event_id").show(5, false)
    s.stop()
  }
}
