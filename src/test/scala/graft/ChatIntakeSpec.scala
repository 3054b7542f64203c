package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ChatData
import graft.streaming.ChatIntake

/** Streaming chat intake: routing equals the batch validator, reasons
  * follow first-fail precedence, batch numbering spans runs, and a
  * replayed batch replaces its own rows instead of duplicating. */
class ChatIntakeSpec extends SparkSpec {

  private def t(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "transcript")
  }

  private val valid =
    """[{"role":"user","content":"hi there"},{"role":"assistant","content":"hello"}]"""
  private val roleOrder =
    """[{"role":"assistant","content":"a"},{"role":"user","content":"q"}]"""
  private val emptyTurn =
    """[{"role":"user","content":"q"},{"role":"assistant","content":""}]"""
  private val short = """[{"role":"user","content":"q"}]"""
  private val junk = "{{{not json"

  test("two-run intake: routing, reasons, cross-run numbering, idempotence") {
    val root = s"${graft.engine.Sinks.scratch}/chat_intake_spec"
    val b1 = t(1L -> valid, 2L -> roleOrder, 3L -> junk)
    val b2 = t(11L -> emptyTurn, 12L -> valid, 13L -> short)
    val report = ChatIntake.twoRunIntake(spark, b1, b2, root)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(report == Map(
      (1L, "valid") -> 1L, (1L, "role_order") -> 1L,
      (1L, "parse_fail") -> 1L,
      (2L, "empty_content") -> 1L, (2L, "valid") -> 1L,
      (2L, "too_short") -> 1L))
    // Accepted sink carries only valid docs; quarantine only invalid.
    val acc = spark.read.parquet(s"$root/accepted")
    assert(acc.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 12L))
    assert(acc.filter(col("reason") =!= "valid").count() == 0)
    val quar = spark.read.parquet(s"$root/quarantine")
    assert(quar.count() == 4 &&
      quar.filter(col("reason") === "valid").count() == 0)
    // Replay idempotence: re-running batch 2's body must REPLACE its
    // partition, not append a duplicate copy. (Counts captured before
    // the rewrite — the old frames' file listings go stale.)
    val (accN, quarN) = (acc.count(), quar.count())
    spark.catalog.clearCache()
    ChatIntake.intakeBatch(b2, 2L, s"$root/accepted", s"$root/quarantine")
    assert(spark.read.parquet(s"$root/accepted").count() == accN)
    assert(spark.read.parquet(s"$root/quarantine").count() == quarN)
  }

  test("all-valid corpus: empty quarantine sink cannot crash the report") {
    // A sink that never received a row carries only a _SUCCESS marker;
    // the report must treat it as empty, not fail schema inference.
    val root = s"${graft.engine.Sinks.scratch}/chat_intake_clean"
    val rep = ChatIntake.twoRunIntake(spark,
      t(1L -> valid, 2L -> valid), t(3L -> valid), root)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(rep == Map((1L, "valid") -> 2L, (2L, "valid") -> 1L))
    // And the mirror image: an all-broken corpus leaves accepted empty.
    val root2 = s"${graft.engine.Sinks.scratch}/chat_intake_dirty"
    val rep2 = ChatIntake.twoRunIntake(spark,
      t(1L -> junk), t(2L -> short), root2)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(rep2 == Map((1L, "parse_fail") -> 1L, (2L, "too_short") -> 1L))
  }

  test("first-fail precedence: one doc, one reason, in gate order") {
    // junk is simultaneously unparseable/short/non-alternating — the
    // reason must be parse_fail alone; short is also 'valid-shaped'
    // but one turn — too_short, not role_order.
    val root = s"${graft.engine.Sinks.scratch}/chat_intake_prec"
    val b = t(1L -> junk, 2L -> short)
    val rep = ChatIntake.twoRunIntake(spark, b, t(3L -> valid), root)
      .filter(col("batch_id") === 1).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(rep == Map("parse_fail" -> 1L, "too_short" -> 1L))
    // Sanity: the routed verdicts agree with the q194 validator.
    val v = ChatData.validateTranscripts(b, "doc_id", "transcript")
      .filter(col("valid") === 1).count()
    assert(v == 0)
  }
}
