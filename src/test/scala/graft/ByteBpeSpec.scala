package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextKernels
import graft.operators.CorpusStats

/** Byte-level BPE (GPT-2 bytes-to-unicode): mapping bijection,
  * pre-tokenization losslessness on mixed scripts + punctuation,
  * byte-exact symbol round-trip, and planted-merge training. */
class ByteBpeSpec extends SparkSpec {

  // Mixed scripts and widths: ASCII, accents (2-byte), CJK (3-byte),
  // an emoji (4-byte, supplementary plane), digits, punctuation runs,
  // and a double space (the documented RE2-no-lookahead fold).
  private val mixed = Seq(
    1L -> "hello world, it's 2026!",
    2L -> "café naïve résumé",
    3L -> "大数据处理 很快",
    4L -> "rocket 🚀 launch... now!!",
    5L -> "price: $1,234.56 (approx)",
    6L -> "double  space\ttab and\nnewline")

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bytes-to-unicode is the GPT-2 bijection") {
    val m = TextKernels.byteToChar
    assert(m.length == 256 && m.distinct.length == 256, "bijective")
    // Printable bytes map to themselves...
    assert(m('A'.toInt) == "A" && m('!'.toInt) == "!" && m(0xff) == "ÿ")
    // ...and the displaced bytes to 0x100+k in byte order: space (the
    // first non-kept byte after the 0x00-0x20 run) is the canonical
    // GPT-2 'Ġ' (U+0120), newline 'Ċ' (U+010A).
    assert(m(' '.toInt) == "Ġ" && m('\n'.toInt) == "Ċ")
    assert(m(0) == "Ā")
  }

  test("pre-tokenization is lossless and byte syms round-trip exactly") {
    val inv: Map[String, Byte] = TextKernels.byteToChar.zipWithIndex
      .map { case (s, b) => s -> b.toByte }.toMap
    val re = CorpusStats.bytePreTokenRegex.r
    mixed.foreach { case (_, text) =>
      val pres = re.findAllIn(text).toSeq
      assert(pres.mkString("") == text,
        s"every byte lands in exactly one pre-token: '$text'")
    }
    // The Spark-side kernel: explode pre-tokens, map to syms, invert.
    val syms = df(mixed)
      .select(col("doc_id"), explode(
        regexp_extract_all(col("text"), lit(CorpusStats.bytePreTokenRegex),
          lit(0))).as("word"))
      .select(col("word"), TextKernels.byteSymsCol(col("word")).as("syms"))
      .collect()
    syms.foreach { r =>
      val word = r.getString(0)
      val back = r.getSeq[String](1).map(inv).toArray
      assert(java.util.Arrays.equals(back,
        word.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
        s"syms must invert to the exact UTF-8 bytes of '$word'")
    }
    // Multi-byte scripts expand: one CJK char = three symbols, so the
    // space-prefixed pre-token " 很快" carries 1 + 2*3 = 7 symbols.
    val cjk = syms.find(_.getString(0) == " 很快")
    assert(cjk.exists(_.getSeq[String](1).length == 7))
  }

  test("planted merge: the dominant byte pair wins round 1, training is deterministic") {
    // "ab" appears in every doc; no other pair competes.
    val docs = df(Seq(1L -> "ab abc ab", 2L -> "drab ab cab", 3L -> "ab"))
    val m1 = CorpusStats.byteBpeTrain(docs, "text", rounds = 3).collect()
    val m2 = CorpusStats.byteBpeTrain(docs, "text", rounds = 3).collect()
    assert(m1.toSeq == m2.toSeq, "training must be deterministic")
    assert(m1.head.getString(1) == "a" && m1.head.getString(2) == "b",
      s"round 1 must merge the dominant pair (a,b): ${m1.head}")
  }

  test("driver-local byte trainer equals the distributed loop") {
    val docs = df(mixed)
    val dist = CorpusStats.byteBpeTrain(docs, "text", rounds = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    val local = CorpusStats.byteBpeTrainLocal(docs, "text", rounds = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(dist == local,
      "same merges, same counts, same tie-breaks — or the stored model drifts")
  }

  test("stored byte model prices UNSEEN text: novel pre-tokens segment, never drop") {
    import org.apache.spark.sql.functions._
    val dir = s"${graft.engine.Sinks.scratch}/byte_bpe_model_spec"
    graft.streaming.IncrementalIngest.deleteDir(spark, dir)
    assertThrows[IllegalArgumentException] {
      CorpusStats.byteBpeTokenizeFromModel(df(mixed), "doc_id", "text", dir)
    }
    CorpusStats.saveByteBpeModel(df(mixed), "text", rounds = 8, dir)
    // Unseen corpus: new emoji, new script mix, text the model never saw.
    val unseen = df(Seq(
      11L -> "hello hello hello",       // seen pre-token: merges apply
      12L -> "σπάρκ δεδομένα 🚀🚀",     // fully unseen Greek + emoji
      13L -> "?!?!?!"))
    val out = CorpusStats.byteBpeTokenizeFromModel(
        unseen, "doc_id", "text", dir)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set(11L, 12L, 13L),
      "every unseen doc emits a row — no vocabulary join to fall out of")
    // Unseen Greek/emoji: byte totals exact, tokens <= bytes (merges
    // that happen to apply can only shrink).
    val (nPre12, nBytes12, nToks12) = out(12L)
    assert(nBytes12 == "σπάρκ δεδομένα 🚀🚀"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
    assert(nPre12 <= nToks12 && nToks12 <= nBytes12)
    // The stored apply on the TRAINING corpus itself is bit-equal to
    // the inline tokenizer at the same rounds (model == chain)...
    val inline = CorpusStats.byteBpeTokenize(df(mixed), "doc_id", "text",
        rounds = 8).orderBy("doc_id").collect().toSeq
    val stored = CorpusStats.byteBpeTokenizeFromModel(df(mixed), "doc_id",
        "text", dir).orderBy("doc_id").collect().toSeq
    assert(stored == inline)
    // ...and compresses it: each trained merge had count >= 2 in this
    // corpus, so total tokens land strictly below total bytes.
    val (totToks, totBytes) = stored.map(r => (r.getLong(3), r.getLong(2)))
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(totToks < totBytes, "trained merges must compress the training corpus")
    graft.engine.Caches.release()
  }

  test("token pricing: lossless byte totals, merge monotonicity, every doc priced") {
    val priced = CorpusStats.byteBpeTokenize(df(mixed), "doc_id", "text",
      rounds = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(priced.keySet == mixed.map(_._1).toSet,
      "every doc emits a row — nothing falls out of a letter filter")
    mixed.foreach { case (id, text) =>
      val (nPre, nBytes, nToks) = priced(id)
      assert(nBytes ==
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length,
        s"doc $id: pre-token bytes must sum to the text's UTF-8 length")
      assert(nPre <= nToks && nToks <= nBytes,
        s"doc $id: pretokens <= tokens <= bytes")
    }
    graft.engine.Caches.release()
  }
}
