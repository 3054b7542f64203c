package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Partitioning-invariance properties for the analytics/monitoring
  * operators (OHLC downsampling, PSI drift) — their hash-gate
  * determinism rests on argmin/argmax commuting across partial
  * aggregation and on reduce-order-independent decimal sums, so the
  * results must be BIT-identical under any physical partitioning. */
object OperatorProperties extends Properties("Operators") {

  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  property("OHLC bars bit-identical under any partitioning (argmin/argmax commute)") =
    forAll(
      Gen.choose(2, 20).flatMap(n => Gen.listOfN(n, Gen.zip(
        Gen.choose(0, 5000), Gen.oneOf("view", "click"),
        Gen.chooseNum(-1000, 1000)))),
      Gen.choose(1, 7), Gen.choose(1, 7)) { (rows, p1, p2) =>
      import spark.implicits._
      val df = rows.zipWithIndex.map { case ((sec, ty, v), i) =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + sec * 1000L),
          ty, v / 10.0)
      }.toDF("event_id", "ts", "event_type", "value")
      def run(p: Int) = graft.operators.EventAnalytics
        .ohlcBars(df.repartition(p))
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7)))
        .sortBy(t => (t._1, t._2)).toSeq
      run(p1) == run(p2)
    }

  property("PSI bit-identical under any partitioning; self-PSI is exactly 0") =
    forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(-500, 500)),
      Gen.nonEmptyListOf(Gen.chooseNum(-500, 500)),
      Gen.choose(1, 7), Gen.choose(1, 7)) { (as, bs, p1, p2) =>
      import spark.implicits._
      val ref = as.map(_ / 10.0).toDF("v")
      val cur = bs.map(_ / 10.0).toDF("v")
      def run(p: Int) = graft.operators.Drift
        .psi(ref.repartition(p), cur.repartition(p), "v", 25.0)
        .head().getDouble(0)
      val self = graft.operators.Drift.psi(ref, ref, "v", 25.0)
        .head().getDouble(0)
      run(p1) == run(p2) && self == 0.0
    }
}
