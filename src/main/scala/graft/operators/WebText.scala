package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-page text extraction — the stage between the raw crawl and every
  * text operator: strip script/style blocks, strip markup tags, decode
  * the common HTML entities, and squash whitespace. (Production
  * extractors add DOM-tree readability heuristics; this is the exact,
  * deterministic core that is oracle-replayable — the regex dialect
  * subset used, including the `(?s)` dotall flag, is identical in Java
  * regex and RE2.)
  *
  * Scale shape: a chain of `regexp_replace`/`replace` projections —
  * map-only, codegen'd, one scan, flat wall at any corpus size.
  */
object WebText {

  /** Entity decode table. Order matters and is part of the contract:
    * `&amp;` decodes LAST, so `&amp;lt;` becomes the literal text
    * `&lt;` (what the page displayed) and never double-decodes to `<`. */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&nbsp;" -> " ",
    "&amp;" -> "&")

  /** HTML → text: drop script/style subtrees (dotall non-greedy), strip
    * remaining tags, decode [[Entities]] in contract order, squash
    * whitespace runs, trim. */
  def htmlToText(c: Column): Column = {
    val noScript = regexp_replace(c, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = Entities.foldLeft(noTags) { case (acc, (ent, ch)) =>
      replace(acc, lit(ent), lit(ch))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Extraction report: the text recovered from each page plus the
    * size accounting a pipeline monitors (markup overhead = how much of
    * the raw page was chrome, a per-source quality proxy). */
  def extractText(pages: DataFrame, idCol: String,
      htmlCol: String): DataFrame =
    pages.select(col(idCol),
        length(col(htmlCol)).as("n_raw_chars"),
        htmlToText(col(htmlCol)).as("text"))
      .withColumn("n_text_chars", length(col("text")))
      .withColumn("markup_overhead", round(
        (col("n_raw_chars") - col("n_text_chars")).cast("double") /
          col("n_raw_chars"), 6))
      .select(col(idCol), col("text"), col("n_raw_chars"),
        col("n_text_chars"), col("markup_overhead"))

  /** Deterministic page synthesis for the q197 harness: each document
    * is wrapped in the full chrome an extractor must remove — head with
    * title and a style block, nav, a script, headline, two paragraph
    * halves, entity-encoded punctuation planted into every 5th doc, and
    * a footer. Harness only. */
  def syntheticHtml(id: Column, text: Column): Column = {
    val toks = split(text, " ")
    val half = (size(toks) / lit(2)).cast("int")
    val p1 = array_join(slice(toks, lit(1), half), " ")
    val p2 = array_join(slice(toks, half + 1, size(toks) - half), " ")
    val entityTail = when(id % 5 === 0,
      lit(" a &amp; b &lt;tag&gt; &quot;q&quot; &amp;lt;")).otherwise(lit(""))
    concat(
      lit("<html><head><title>Doc "), id.cast("string"),
      lit("</title><style>body { color: #333; }</style></head>"),
      lit("<body><nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a></nav>"),
      lit("<script type=\"text/javascript\">var x = 1 < 2; track();</script>"),
      lit("<h1>Doc "), id.cast("string"), lit("</h1><p>"), p1,
      lit("</p>\n<p>"), p2, entityTail,
      lit("</p><footer>Contact &#39;us&#39;</footer></body></html>"))
  }

  /** Oracle twin of [[syntheticHtml]] → [[extractText]] (DuckDB; the
    * same regex chain with explicit 'g' flags, the same entity order,
    * `chr(10)` for the planted newline so the SQL stays one line). */
  def extractTextSql(from: String = "documents"): String = {
    val entityChain = Entities.foldLeft("stripped") { case (acc, (ent, ch)) =>
      val sqlCh = ch match {
        case "\"" => "'\"'"
        case "'" => "chr(39)"
        case other => s"'$other'"
      }
      s"replace($acc, '$ent', $sqlCh)"
    }
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |    FROM $from),
       |h AS (SELECT doc_id,
       |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
       |    '</title><style>body { color: #333; }</style></head>' ||
       |    '<body><nav><a href="/">Home</a> | <a href="/about">About</a></nav>' ||
       |    '<script type="text/javascript">var x = 1 < 2; track();</script>' ||
       |    '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' ||
       |    coalesce(array_to_string(toks[1 : len(toks) // 2], ' '), '') ||
       |    '</p>' || chr(10) || '<p>' ||
       |    coalesce(array_to_string(toks[len(toks) // 2 + 1 :], ' '), '') ||
       |    (CASE WHEN doc_id % 5 = 0
       |      THEN ' a &amp; b &lt;tag&gt; &quot;q&quot; &amp;lt;'
       |      ELSE '' END) ||
       |    '</p><footer>Contact &#39;us&#39;</footer></body></html>' AS html
       |  FROM t),
       |x AS (SELECT doc_id, html,
       |    CAST(length(html) AS INTEGER) AS n_raw_chars,
       |    trim(regexp_replace($entityChain, '\\s+', ' ', 'g')) AS text
       |  FROM (SELECT doc_id, html,
       |    regexp_replace(regexp_replace(regexp_replace(html,
       |      '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
       |      '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
       |      '<[^>]*>', ' ', 'g') AS stripped
       |    FROM h) _)
       |SELECT doc_id, text, n_raw_chars,
       |  CAST(length(text) AS INTEGER) AS n_text_chars,
       |  round(CAST(n_raw_chars - length(text) AS DOUBLE) / n_raw_chars, 6)
       |    AS markup_overhead
       |FROM x""".stripMargin
  }
}
