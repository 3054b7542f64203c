package graft

import org.apache.spark.sql.functions._

import graft.operators.ChatData

/** Structural validation of chat transcripts: hand-built JSON fixtures
  * covering every rule, plus the synthetic-transcript plant schedule. */
class ChatDataSpec extends SparkSpec {

  private def transcripts(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "transcript")
  }

  test("validateTranscripts: every structural rule, hand-built JSON") {
    val d = transcripts(
      // 1: canonical valid shape (system + user/assistant/user).
      1L -> """[{"role":"system","content":"be helpful"},
               {"role":"user","content":"hi there"},
               {"role":"assistant","content":"hello"},
               {"role":"user","content":"bye"}]""".filterNot(_ == '\n'),
      // 2: valid without a system message.
      2L -> """[{"role":"user","content":"q"},{"role":"assistant","content":"a"}]""",
      // 3: starts with assistant — alternation fails.
      3L -> """[{"role":"assistant","content":"a"},{"role":"user","content":"q"}]""",
      // 4: two user turns in a row.
      4L -> """[{"role":"user","content":"q"},{"role":"user","content":"q2"}]""",
      // 5: unknown role.
      5L -> """[{"role":"user","content":"q"},{"role":"bot","content":"a"}]""",
      // 6: empty assistant content.
      6L -> """[{"role":"user","content":"q"},{"role":"assistant","content":""}]""",
      // 7: single turn — too short even though alternation holds.
      7L -> """[{"role":"user","content":"q"}]""",
      // 8: unparseable JSON — quarantined, not an exception.
      8L -> """not json at all""",
      // 9: system in the middle — role whitelist fails.
      9L -> """[{"role":"user","content":"q"},{"role":"system","content":"x"}]""",
      // 10: missing content field counts as empty.
      10L -> """[{"role":"user","content":"q"},{"role":"assistant"}]""")
    val v = ChatData.validateTranscripts(d, "doc_id", "transcript")
      .orderBy("doc_id").collect()
    def row(i: Int) = v(i)
    assert(row(0).getAs[Int]("valid") == 1 &&
      row(0).getAs[Int]("n_turns") == 4 &&
      row(0).getAs[Long]("total_tokens") == 6L)
    assert(row(1).getAs[Int]("valid") == 1)
    assert(row(2).getAs[Int]("alternation_ok") == 0)
    assert(row(3).getAs[Int]("alternation_ok") == 0)
    assert(row(4).getAs[Int]("alternation_ok") == 0)
    assert(row(5).getAs[Int]("n_empty") == 1 &&
      row(5).getAs[Int]("valid") == 0)
    assert(row(6).getAs[Int]("alternation_ok") == 1 &&
      row(6).getAs[Int]("valid") == 0, "one turn: well-formed but too short")
    assert(row(7).getAs[Int]("n_turns") == 0 &&
      row(7).getAs[Int]("valid") == 0, "bad JSON is quarantined")
    assert(row(8).getAs[Int]("alternation_ok") == 0)
    assert(row(9).getAs[Int]("n_empty") == 1 &&
      row(9).getAs[Int]("valid") == 0)
  }

  test("syntheticTranscript: plant schedule drives the gate as designed") {
    import spark.implicits._
    val text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    val d = Seq(1L, 13L, 17L, 13L * 17L).map(_ -> text).toDF("doc_id", "text")
    val v = ChatData.validateTranscripts(
      d.select(col("doc_id"), ChatData.syntheticTranscript(
        col("doc_id"), col("text")).as("t")),
      "doc_id", "t").orderBy("doc_id").collect()
    assert(v(0).getAs[Int]("valid") == 1 &&
      v(0).getAs[Long]("total_tokens") == 16L)
    assert(v(1).getAs[Int]("alternation_ok") == 0, "13: role swap")
    assert(v(2).getAs[Int]("n_empty") == 1 &&
      v(2).getAs[Int]("alternation_ok") == 1, "17: empty turn only")
    assert(v(3).getAs[Int]("alternation_ok") == 0 &&
      v(3).getAs[Int]("n_empty") == 1, "221: both plants stack")
  }
}
