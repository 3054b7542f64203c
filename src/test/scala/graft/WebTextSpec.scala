package graft

import org.apache.spark.sql.functions._

import graft.operators.WebText

/** HTML→text extraction: hand fixtures for each strip/decode rule and
  * the round-trip property over the synthetic pages. */
class WebTextSpec extends SparkSpec {

  private def pages(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "html")
  }

  test("htmlToText: tags, script/style subtrees, entities, whitespace") {
    import spark.implicits._
    val cases = Seq(
      "<p>hello <b>world</b></p>" -> "hello world",
      // script body vanishes even when it contains < and newlines.
      "a<script>if (1 < 2) {\n fail(); }</script>b" -> "a b",
      "a<style>p { x: 1 }</style>b" -> "a b",
      // entity decode, &amp; last: &amp;lt; renders as the text "&lt;".
      "x &amp; y &lt;z&gt; &amp;lt; &quot;q&quot; &#39;s&#39;" ->
        "x & y <z> &lt; \"q\" 's'",
      "&nbsp;spaced&nbsp;&nbsp;out&nbsp;" -> "spaced out",
      "  runs \n\n of\t whitespace  " -> "runs of whitespace")
    val got = cases.map(_._1).toDF("h")
      .select(WebText.htmlToText(col("h"))).as[String].collect().toSeq
    assert(got == cases.map(_._2),
      got.zip(cases).filter { case (g, (_, w)) => g != w }.mkString("; "))
  }

  test("extractText round-trips the document text out of synthetic pages") {
    import spark.implicits._
    val d = Seq(5L -> "alpha beta gamma delta", 7L -> "solo")
      .toDF("doc_id", "text")
    val out = WebText.extractText(
      d.select(col("doc_id"),
        WebText.syntheticHtml(col("doc_id"), col("text")).as("html")),
      "doc_id", "html").orderBy("doc_id").collect()
    // id 5 (≡0 mod 5): chrome + headline + planted entity tail.
    assert(out(0).getAs[String]("text") ==
      "Doc 5 Home | About Doc 5 alpha beta gamma delta " +
        "a & b <tag> \"q\" &lt; Contact 'us'")
    // id 7: no entity tail; 1-token doc → empty first half.
    assert(out(1).getAs[String]("text") ==
      "Doc 7 Home | About Doc 7 solo Contact 'us'")
    assert(out.forall(r => r.getAs[Double]("markup_overhead") > 0.5),
      "chrome dominates these tiny docs")
    assert(out.forall(r => r.getAs[Int]("n_text_chars") ==
      r.getAs[String]("text").length))
  }
}
