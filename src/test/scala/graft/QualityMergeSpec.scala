package graft

import org.apache.spark.sql.functions._

import graft.engine.{Ingest, Sinks}
import graft.operators.{Merge, QualityReport}

/** Quality-audit, snapshot-diff and schema-evolution semantics. */
class QualityMergeSpec extends SparkSpec {
  import spark.implicits._

  test("quality audit flags exactly the planted defects, in one job") {
    val df = Seq(
      (Some(1L), "F", 10.0), (Some(2L), "F", -5.0),   // -5 out of range
      (None, "O", 20.0),                              // null key
      (Some(3L), "X", 30.0), (Some(3L), "O", 40.0))   // bad status + dup
      .toDF("k", "status", "price")
    val got = QualityReport.audit(df, Seq(
      QualityReport.completeness("k"),
      QualityReport.uniqueness("k"),
      QualityReport.inRange("price", 0, 100),
      QualityReport.isIn("status", Seq("F", "O", "P"))))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("completeness_k") == 4.0 / 5)
    assert(got("uniqueness_k") == 3.0 / 5)
    assert(got("range_price") == 4.0 / 5)
    assert(got("membership_status") == 4.0 / 5)
  }

  test("in-flight audit observes the same fractions with zero extra passes") {
    import graft.engine.Tables
    val ordersDf = Tables.orders(spark, sf)
    val checks = Seq(
      QualityReport.completeness("o_custkey"),
      QualityReport.inRange("o_totalprice", 0, 1000000),
      QualityReport.isIn("o_orderstatus", Seq("F", "O", "P")))
    val (flowing, obs) = QualityReport.auditInFlight(ordersDf, checks)
    // The "real" job: an aggregation the pipeline was running anyway.
    flowing.groupBy("o_orderpriority").count().collect()
    val separate = QualityReport.audit(ordersDf, checks).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    checks.foreach { c =>
      assert(obs.get(c.name) == separate(c.name),
        s"observed ${c.name} diverged from the standalone audit")
    }
  }

  test("snapshot diff classifies added/removed/changed and skips unchanged") {
    val before = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val after = Seq((1L, 10L), (2L, 99L), (4L, 40L)).toDF("k", "v")
    val diff = Merge.snapshotDiff(before, after, "k")
      .orderBy("k").collect()
    assert(diff.map(_.getString(1)).toSeq ==
      Seq("changed", "removed", "added"))
    val changed = diff(0)
    assert(changed.getAs[Long]("old_v") == 20L &&
      changed.getAs[Long]("new_v") == 99L)
    // Replaying the diff onto `before` reconstructs `after` exactly.
    val adds = after.join(
      Merge.snapshotDiff(before, after, "k")
        .where(col("change_type") =!= "removed").select("k"), "k")
    val removedKeys = Merge.snapshotDiff(before, after, "k")
      .where(col("change_type") === "removed").select("k")
    val replayed = Merge.upsert(before, adds, "k")
      .join(removedKeys, Seq("k"), "left_anti")
    assert(replayed.exceptAll(after).count() == 0)
    assert(after.exceptAll(replayed).count() == 0)
  }

  test("merged-schema scan null-fills columns missing from old batches") {
    val base = s"${Sinks.scratch}/evo-spec"
    Seq((1L, "a")).toDF("id", "x")
      .write.mode("overwrite").parquet(s"$base/v1")
    Seq((2L, "b", 9L)).toDF("id", "x", "y")
      .write.mode("overwrite").parquet(s"$base/v2")
    val got = Ingest.readParquetMerged(spark, Seq(s"$base/v1", s"$base/v2"))
      .orderBy("id").collect()
    assert(got.length == 2)
    assert(got(0).isNullAt(got(0).fieldIndex("y")),
      "old batch must surface the new column as null")
    assert(got(1).getAs[Long]("y") == 9L)
  }
}
