package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.engine.{Aggregates, Cleaning}

/** ScalaCheck properties for the algebraic contracts (SURVEY.md §5.4).
  * Each case runs real Spark jobs, so the suites cap case counts low —
  * the point is the algebra (partitioning invariance, totality,
  * idempotence), not sampling density. */
object EngineProperties extends Properties("Engine") {

  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val cents: Gen[Double] =
    Gen.chooseNum(-1000000L, 1000000L).map(_ / 100.0)

  property("sumExact: partial+final under any partitioning == exact decimal sum") =
    forAll(Gen.nonEmptyListOf(cents), Gen.choose(1, 8)) { (xs, parts) =>
      import spark.implicits._
      val got = xs.toDF("x").repartition(parts)
        .agg(Aggregates.sumExact(col("x")).as("s"))
        .head().getDouble(0)
      val want = xs.map(BigDecimal(_)).sum.toDouble
      got == want
    }

  property("avgExact: partitioning-invariant (no sum-of-chunk-means, quirk Q1)") =
    forAll(Gen.nonEmptyListOf(cents), Gen.choose(1, 8), Gen.choose(1, 8)) {
      (xs, p1, p2) =>
        import spark.implicits._
        def run(p: Int) = xs.toDF("x").repartition(p)
          .agg(Aggregates.avgExact(col("x")).as("a")).head().getDouble(0)
        run(p1) == run(p2)
    }

  property("formatHHMM: total on 0..2400, HH:MM shape, 2400 wraps") =
    forAll(Gen.listOfN(50, Gen.choose(0, 2400))) { vs =>
      import spark.implicits._
      val got = vs.toDF("hhmm")
        .select(Cleaning.formatHHMM(col("hhmm")).as("t"))
        .as[String].collect()
      got.zip(vs).forall { case (t, v) =>
        val w = if (v == 2400) 0 else v
        t == f"${w / 100}%02d:${w % 100}%02d"
      }
    }

  property("saltedInner == plain inner join for any key multisets and salt") =
    forAll(
      Gen.listOf(Gen.zip(Gen.choose(0L, 6L), Gen.choose(0L, 100L))),
      Gen.listOf(Gen.zip(Gen.choose(0L, 6L), Gen.choose(0L, 100L))),
      Gen.choose(1, 7)) { (probe, build, salt) =>
      import spark.implicits._
      import graft.engine.Joins
      val p = probe.toDF("k", "pv")
      val b = build.toDF("k", "bv")
      val plain = p.join(b, Seq("k")).select("k", "pv", "bv")
      val salted = Joins.saltedInner(p, b, "k", salt).select("k", "pv", "bv")
      // Multiset equality: duplicates on either side must multiply
      // identically through the salted form.
      salted.exceptAll(plain).count() == 0 &&
        plain.exceptAll(salted).count() == 0
    }

  property("union then distinct == distinct of distincts (G1 idempotence)") =
    forAll(Gen.listOf(Gen.choose(0, 20)), Gen.listOf(Gen.choose(0, 20))) {
      (a, b) =>
        import spark.implicits._
        val da = a.toDF("k"); val db = b.toDF("k")
        val u1 = da.union(db).distinct()
        val u2 = da.distinct().union(db.distinct()).distinct()
        u1.except(u2).count() == 0 && u2.except(u1).count() == 0 &&
          u1.count() == (a ++ b).distinct.size
    }

  // Dense-tie generators: keys from a 4-value space, timestamps from a
  // 12-value space, so inclusive bounds, equal-ts ties and multi-match
  // groups all occur in nearly every case.
  private val asofRow: Gen[(Long, Long, Long)] = for {
    k <- Gen.choose(0L, 3L); ts <- Gen.choose(0L, 11L); id <- Gen.choose(0L, 999L)
  } yield (k, ts, id)

  property("asofBackward == naive range-join + argmax on arbitrary inputs") =
    forAll(Gen.listOfN(25, asofRow), Gen.listOfN(25, asofRow)) { (ls, rs) =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      // Distinct lid/rid so the naive row_number pick is well-defined.
      val left = ls.zipWithIndex.map { case ((k, ts, _), i) => (k, ts, i.toLong) }
        .toDF("k", "lts", "lid")
      val right = rs.zipWithIndex.map { case ((k, ts, _), i) => (k, ts, 1000L + i) }
        .toDF("k", "rts", "rid")
      val got = graft.engine.Joins.asofBackward(left, right, "k", "lts", "rts")
        .select("k", "lts", "lid", "rts", "rid")
      val w = Window.partitionBy("lid")
        .orderBy(col("rts").desc_nulls_last, col("rid").desc_nulls_last)
      val naive = left.join(right.withColumnRenamed("k", "rk"),
          col("k") === col("rk") && col("rts") <= col("lts"), "left")
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select("k", "lts", "lid", "rts", "rid")
      got.exceptAll(naive).count() == 0 && naive.exceptAll(got).count() == 0
    }

  private val intervalRow: Gen[(Long, Long)] = for {
    s <- Gen.choose(0L, 100000000L); len <- Gen.oneOf(Gen.const(0L),
      Gen.choose(1L, 30000000L))
  } yield (s, s + len)

  property("binnedIntervalJoin == naive cross-filter for any bin width") =
    forAll(Gen.listOfN(40, Gen.choose(0L, 100000000L)),
      Gen.listOfN(15, intervalRow), Gen.choose(1L, 60L)) { (pts, ivs, binSec) =>
      import spark.implicits._
      val points = pts.zipWithIndex.map { case (us, i) => (i.toLong, us) }
        .toDF("pid", "us")
        .select(col("pid"), timestamp_micros(col("us")).as("ts"))
      val intervals = ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("iid", "s_us", "e_us")
        .select(col("iid"), timestamp_micros(col("s_us")).as("w_start"),
          timestamp_micros(col("e_us")).as("w_end"))
      val got = graft.engine.Joins.binnedIntervalJoin(points, "ts",
        intervals, "w_start", "w_end", binSec).select("pid", "iid")
      val naive = points.crossJoin(intervals)
        .where(col("ts") >= col("w_start") && col("ts") < col("w_end"))
        .select("pid", "iid")
      got.exceptAll(naive).count() == 0 && naive.exceptAll(got).count() == 0
    }

  // Random change logs: few keys/values/timestamps so collisions (the
  // interesting case: consecutive-same runs, same-ts ties) are common.
  private val changeLog: Gen[List[(Long, String, Long, Long)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.choose(1L, 4L)
      v <- Gen.oneOf("A", "B", "C")
      ts <- Gen.choose(0L, 20L)
      tie <- Gen.choose(0L, 1000L)
    } yield (k, v, ts, tie)).map(_.distinctBy(r => (r._1, r._3, r._4)))

  property("scd2: rows reconstruct the per-key timeline (reference replay)") =
    forAll(changeLog, Gen.choose(1, 8)) { (log, parts) =>
      import spark.implicits._
      val got = graft.operators.Merge.scd2(
        log.toDF("k", "v", "ts", "tie").repartition(parts),
        "k", "v", "ts", "tie")
        .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
      // Driver-side reference: sort per key by (ts, tie), collapse
      // consecutive-same values, half-open ranges, last row current.
      val want = log.groupBy(_._1).flatMap { case (k, rows) =>
        val ordered = rows.sortBy(r => (r._3, r._4))
        val changes = ordered.foldLeft(List.empty[(String, Long)]) {
          case (acc, (_, v, ts, _)) =>
            if (acc.headOption.exists(_._1 == v)) acc else (v, ts) :: acc
        }.reverse
        changes.zipAll(changes.drop(1).map(c => Some(c._2)), null, None)
          .collect { case ((v, ts), next) =>
            (k, v, ts, next, next.isEmpty) }
      }.toSet
      got == want
    }

  property("scd2: validity ranges per key never overlap and cover in order") =
    forAll(changeLog) { log =>
      import spark.implicits._
      val rows = graft.operators.Merge.scd2(
        log.toDF("k", "v", "ts", "tie"), "k", "v", "ts", "tie")
        .as[(Long, String, Long, Option[Long], Boolean)].collect()
      rows.groupBy(_._1).forall { case (_, rs) =>
        val sorted = rs.sortBy(_._3)
        val chained = sorted.sliding(2).forall {
          case Array(a, b) => a._4.contains(b._3)
          case _ => true
        }
        val oneCurrent = rs.count(_._5) == 1
        chained && oneCurrent && sorted.last._4.isEmpty
      }
    }
}
