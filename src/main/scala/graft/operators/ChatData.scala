package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conversation-transcript validation — the SFT/chat-data intake gate.
  * Instruction-tuning corpora arrive as JSON message arrays
  * (`[{role, content}, …]`); before any training run, a pipeline
  * validates structure: an optional leading `system` message, then a
  * `user`/`assistant` body that starts with `user` and strictly
  * alternates, no empty contents, at least two turns. Malformed rows
  * (scraper glitches, truncated uploads, role-order bugs in the
  * generating harness) otherwise become silent training noise.
  *
  * Scale shape: `from_json` + array higher-order functions — one
  * map-only projection per document, no shuffle; the JSON schema is
  * fixed so the parser is a single codegen'd converter. Validation is
  * generic over turn count (the HOFs run per-row over however many
  * messages the transcript carries).
  */
object ChatData {

  val MessageSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType),
    StructField("content", StringType))))

  /** Structural validation of a JSON transcript column. Output per row:
    * `n_turns`, `alternation_ok` (optional leading system; body starts
    * with `user`, strictly alternates, only user/assistant roles),
    * `n_empty` (blank contents), `total_tokens` (whitespace tokens over
    * non-empty contents), `valid` (all checks pass, ≥2 turns). A row
    * whose JSON fails to parse gets `n_turns = 0` and `valid = 0` —
    * quarantined, never an exception (ANSI-safe totality). */
  def validateTranscripts(df: DataFrame, idCol: String,
      jsonCol: String): DataFrame = {
    val msgs = from_json(col(jsonCol), MessageSchema)
    val roles = transform(msgs, m => m.getField("role"))
    val nTurns = coalesce(size(msgs), lit(0))
    // `get` (0-based) returns null out-of-bounds — ANSI-safe where
    // `element_at` would raise on an empty transcript.
    val hasSystem = get(roles, lit(0)) === "system"
    val body = when(hasSystem,
      slice(roles, lit(2), greatest(size(roles) - 1, lit(0))))
      .otherwise(roles)
    val badRoles = size(filter(body,
      r => !(r === "user" || r === "assistant")))
    // Adjacent-equal scan: zip the body with itself shifted by one; any
    // equal pair breaks strict alternation.
    val adjacentEqual = size(filter(
      zip_with(
        slice(body, lit(1), greatest(size(body) - 1, lit(0))),
        slice(body, lit(2), greatest(size(body) - 1, lit(0))),
        (a, b) => a === b),
      x => x))
    val alternationOk = coalesce(
      (nTurns > 0 && size(body) > 0 && get(body, lit(0)) === "user" &&
        badRoles === 0 && adjacentEqual === 0).cast("int"), lit(0))
    // A missing `content` field counts as empty (coalesced length), so a
    // truncated message can never slip through as valid.
    def contentLen(m: Column): Column =
      coalesce(length(m.getField("content")), lit(0))
    val nEmpty = coalesce(size(filter(msgs, m => contentLen(m) === 0)),
      lit(0))
    // Token counting goes through the shared TextFunctions contract so
    // the operator and its DuckDB twin (string_split/len) can never
    // drift on whitespace edge cases: Spark's split keeps trailing
    // empty strings at its default limit of -1, exactly like DuckDB's
    // string_split, and the single shared definition keeps it that way.
    val totalTokens = coalesce(aggregate(msgs, lit(0L),
      (acc, m) => acc + when(contentLen(m) === 0, 0L)
        .otherwise(graft.functions.TextFunctions
          .tokenCount(m.getField("content")).cast("long"))),
      lit(0L))
    df.select(col(idCol),
      nTurns.as("n_turns"),
      alternationOk.as("alternation_ok"),
      nEmpty.cast("int").as("n_empty"),
      totalTokens.as("total_tokens"))
      .withColumn("valid",
        (col("alternation_ok") === 1 && col("n_empty") === 0 &&
          col("n_turns") >= 2).cast("int"))
  }

  /** Deterministic transcript synthesis for the q194 harness: four
    * messages (`system`, `user`, `assistant`, `user`) whose contents
    * are consecutive 4-token slices of the document text. Every 13th
    * document gets its user/assistant body swapped (the role-order bug
    * an agent harness produces), every 17th an empty assistant turn
    * (truncated generation). Harness only — the validator never sees
    * the plant schedule. */
  def syntheticTranscript(id: Column, text: Column): Column = {
    val toks = split(text, " ")
    def content(i: Int): Column =
      array_join(slice(toks, i * 4 + 1, 4), " ")
    def msg(role: String, c: Column): Column =
      struct(lit(role).as("role"), c.as("content"))
    val c2 = when(id % 17 === 0, lit("")).otherwise(content(2))
    val roleswap = id % 13 === 0
    to_json(array(
      msg("system", content(0)),
      when(roleswap, msg("assistant", content(1)))
        .otherwise(msg("user", content(1))),
      when(roleswap, msg("user", c2)).otherwise(msg("assistant", c2)),
      msg("user", content(3))))
  }

  /** Oracle twin of [[syntheticTranscript]] → [[validateTranscripts]]
    * (DuckDB): the transcript is materialized as real JSON
    * (`json_array`/`json_object`), read back with `json_extract_string`,
    * and validated with the SAME generic rule — list lambdas over the
    * role list (leading-system strip, user-start, adjacent-equal scan,
    * role whitelist), not a hard-coded valid pattern. */
  def validateTranscriptsSql(): String = {
    // A slice entirely past the end is the empty list, whose
    // array_to_string is NULL in DuckDB (Spark's array_join gives '') —
    // coalesce so a short document's empty tail turn matches.
    val contents = (0 to 3).map(i =>
      s"coalesce(array_to_string((string_split(text, ' '))" +
        s"[${i * 4 + 1} : ${i * 4 + 4}], ' '), '')")
    s"""WITH c AS (SELECT doc_id,
       |    ${contents(0)} AS c0, ${contents(1)} AS c1,
       |    CASE WHEN doc_id % 17 = 0 THEN '' ELSE ${contents(2)} END AS c2,
       |    ${contents(3)} AS c3,
       |    doc_id % 13 = 0 AS roleswap
       |  FROM documents),
       |j AS (SELECT doc_id, json_array(
       |    json_object('role', 'system', 'content', c0),
       |    json_object('role',
       |      CASE WHEN roleswap THEN 'assistant' ELSE 'user' END,
       |      'content', c1),
       |    json_object('role',
       |      CASE WHEN roleswap THEN 'user' ELSE 'assistant' END,
       |      'content', c2),
       |    json_object('role', 'user', 'content', c3)) AS t
       |  FROM c),
       |p AS (SELECT doc_id,
       |    CAST(json_array_length(t) AS INTEGER) AS n_turns,
       |    [json_extract_string(t, '$$[0].role'),
       |     json_extract_string(t, '$$[1].role'),
       |     json_extract_string(t, '$$[2].role'),
       |     json_extract_string(t, '$$[3].role')] AS roles,
       |    [json_extract_string(t, '$$[0].content'),
       |     json_extract_string(t, '$$[1].content'),
       |     json_extract_string(t, '$$[2].content'),
       |     json_extract_string(t, '$$[3].content')] AS cs
       |  FROM j),
       |b AS (SELECT doc_id, n_turns, cs,
       |    CASE WHEN roles[1] = 'system' THEN roles[2:] ELSE roles END
       |      AS body
       |  FROM p),
       |v AS (SELECT doc_id, n_turns,
       |    CASE WHEN n_turns > 0 AND len(body) > 0 AND body[1] = 'user'
       |      AND len(list_filter(body,
       |        r -> r NOT IN ('user', 'assistant'))) = 0
       |      AND len(list_filter(range(2, len(body) + 1),
       |        i -> body[i] = body[i - 1])) = 0
       |      THEN 1 ELSE 0 END AS alternation_ok,
       |    CAST(len(list_filter(cs, s -> length(s) = 0)) AS INTEGER)
       |      AS n_empty,
       |    CAST(list_sum(list_transform(cs, s ->
       |      CASE WHEN length(s) = 0 THEN 0
       |        ELSE len(string_split(s, ' ')) END)) AS BIGINT)
       |      AS total_tokens
       |  FROM b)
       |SELECT doc_id, n_turns, alternation_ok, n_empty, total_tokens,
       |  CASE WHEN alternation_ok = 1 AND n_empty = 0 AND n_turns >= 2
       |    THEN 1 ELSE 0 END AS valid
       |FROM v""".stripMargin
  }
}
