package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{TextFunctions, TextKernels}

/** ScalaCheck properties for the native per-row text kernels, checked
  * against independent pure-Scala reference implementations (Java String
  * splitting / code-point iteration — a different code path from the
  * kernels' UTF-8 byte scans). No Spark jobs — these are plain function
  * calls, so case counts can be dense. */
object TextKernelProperties extends Properties("TextKernels") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val P = 1000000007L

  /** Valid-unicode strings (no lone surrogates — UTF8String.fromString
    * would replace those lossily before the kernel ever ran). Mixes
    * ASCII words, marker words, multi-byte chars, spaces. */
  private val token: Gen[String] = Gen.frequency(
    4 -> Gen.oneOf(TextFunctions.stopwords),
    2 -> Gen.oneOf(TextFunctions.langMarkers.flatMap(_._2)),
    3 -> Gen.alphaNumStr.map(_.take(8)),
    1 -> Gen.const(""),
    1 -> Gen.oneOf("naïve", "\u00fcber", "caf\u00e9", "一鿿", "☃", "👍", "ｈｅｌｌｏ"))

  private val text: Gen[String] =
    Gen.listOf(token).map(_.mkString(" "))

  property("markerHits == String.split count over the word set") = {
    val wordsGen = Gen.oneOf(
      TextFunctions.stopwords +: TextFunctions.langMarkers.map(_._2))
    forAll(text, wordsGen) { (s, words) =>
      val set = new java.util.HashSet[UTF8String]()
      words.foreach(w => set.add(UTF8String.fromString(w)))
      val got = TextKernels.markerHits(UTF8String.fromString(s), set)
      val want = s.split(" ", -1).count(words.contains)
      got == want
    }
  }

  property("polyFingerprint == code-point fold on the String") =
    forAll(text) { s =>
      val got = TextKernels.polyFingerprint(UTF8String.fromString(s))
      var want = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        want = java.lang.Math.floorMod(want * 31L + cp, P)
        i += Character.charCount(cp)
      }
      got == want
    }

  property("sortedIntersectCount == Set intersection size on sorted distinct arrays") = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // Binary (unsigned byte) order — what array_sort uses for strings.
    val byBytes = Ordering.comparatorToOrdering(
      (a: UTF8String, b: UTF8String) => a.compareTo(b))
    def arr(toks: List[String]): (GenericArrayData, Set[String]) = {
      val distinct = toks.distinct.map(UTF8String.fromString).sorted(byBytes)
      (new GenericArrayData(distinct.toArray[Any]), distinct.map(_.toString).toSet)
    }
    forAll(Gen.listOf(token), Gen.listOf(token)) { (ta, tb) =>
      val (aArr, aSet) = arr(ta)
      val (bArr, bSet) = arr(tb)
      TextKernels.sortedIntersectCount(aArr, bArr) == (aSet & bSet).size
    }
  }

  property("simhash64 is token-order invariant (per-bit ±1 sums commute)") =
    forAll(Gen.nonEmptyListOf(token), Gen.long) { (toks, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(toks)
      TextKernels.simhash64(UTF8String.fromString(toks.mkString(" "))) ==
        TextKernels.simhash64(UTF8String.fromString(shuffled.mkString(" ")))
    }

  property("byte pre-tokenization is LOSSLESS for arbitrary unicode") = {
    // Every char falls in exactly one alternative (letter/digit/punct
    // runs with an optional leading space, or a whitespace run), so
    // the matches concatenate back to the input — the GPT-2 guarantee
    // the \p{L}+ word filter lacks. Checked over adversarial text,
    // not just the fixture.
    val re = graft.operators.CorpusStats.bytePreTokenRegex.r
    forAll(text) { s =>
      re.findAllIn(s).mkString("") == s
    }
  }

  property("byteSyms inverts to the exact UTF-8 bytes (bijection round-trip)") = {
    val inv: Map[String, Byte] = TextKernels.byteToChar.zipWithIndex
      .map { case (c, b) => c -> b.toByte }.toMap
    forAll(text) { s =>
      val syms = TextKernels.byteSyms(UTF8String.fromString(s))
      val back = (0 until syms.numElements())
        .map(i => inv(syms.getUTF8String(i).toString)).toArray
      java.util.Arrays.equals(back,
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** Text that actually exercises canonical (de)composition: combining
    * marks, precomposed accents, decomposed Hangul jamo, singleton
    * replacements (U+212B angstrom). Escapes, not literals — an editor
    * normalizing this file must not be able to erase the test. */
  private val nfcToken: Gen[String] = Gen.frequency(
    3 -> Gen.alphaNumStr.map(_.take(8)),
    2 -> Gen.oneOf("ke\u0301y", "k\u00e9y", "cafe\u0301", "caf\u00e9",
      "u\u0308ber", "\u00fcber", "n\u0303", "\u00f1"),
    1 -> Gen.oneOf("\u1112\u1161\u11ab", "\ud55c", // han: jamo vs syllable
      "\u212b", "A\u030a", "\u00c5"), // angstrom vs A+ring vs precomposed
    1 -> Gen.const(""))

  private val nfcText: Gen[String] =
    Gen.listOf(nfcToken).map(_.mkString(" "))

  property("nfcNormalize collapses all canonical-equivalent spellings") = {
    import java.text.Normalizer
    forAll(nfcText) { s =>
      val viaKernel = TextKernels.nfcNormalize(UTF8String.fromString(s))
        .toString
      // Scramble through NFD: a canonically-equivalent byte-distinct
      // spelling must normalize to the SAME string.
      val nfd = Normalizer.normalize(s, Normalizer.Form.NFD)
      val viaNfd = TextKernels.nfcNormalize(UTF8String.fromString(nfd))
        .toString
      viaKernel == viaNfd &&
        // idempotent, and already-NFC input is returned unchanged
        TextKernels.nfcNormalize(
          UTF8String.fromString(viaKernel)).toString == viaKernel
    }
  }

  property("nfcNormalize is the identity object on ASCII (fast path)") =
    forAll(Gen.asciiPrintableStr) { s =>
      val in = UTF8String.fromString(s)
      // Reference equality: the quick-check path must hand back the
      // same object, not a copy — that is the 100 TB no-op guarantee.
      TextKernels.nfcNormalize(in) eq in
    }

  /** Pure-Scala Luhn reference (BigInt-free, digit chars). */
  private def luhnRef(digits: String): Boolean = {
    val s = digits.reverse.zipWithIndex.map { case (ch, i) =>
      val d = ch - '0'
      if (i % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
    }.sum
    s % 10 == 0
  }

  private val digits16: Gen[String] =
    Gen.listOfN(16, Gen.numChar).map(_.mkString)

  property("luhnValid == the independent reference over random 16-digit runs") =
    forAll(digits16) { d =>
      val b = d.getBytes("UTF-8")
      TextKernels.luhnValid(b, 0, b.length) == luhnRef(d)
    }

  /** Card-bearing text: digit runs of various lengths (only exactly-16
    * runs are candidates) interleaved with words and separators. */
  private val cardText: Gen[String] = {
    val runLen = Gen.frequency(4 -> Gen.const(16),
      1 -> Gen.choose(1, 15), 1 -> Gen.choose(17, 22))
    val piece = Gen.frequency(
      3 -> runLen.flatMap(n => Gen.listOfN(n, Gen.numChar).map(_.mkString)),
      3 -> Gen.alphaStr.map(_.take(6)),
      1 -> Gen.const(""))
    Gen.listOf(piece).map(_.mkString(" "))
  }

  property("cardScrub/cardCount == a maximal-run reference scrubber") = {
    def refScrub(s: String): (String, Int) = {
      val runs = "[0-9]+".r.findAllMatchIn(s).toList
      val valid = runs.filter(m => m.end - m.start == 16 &&
        luhnRef(s.substring(m.start, m.end)))
      // java.lang.StringBuilder: Scala's append(Any) would otherwise
      // swallow the 3-arg form as a tuple.
      val sb = new java.lang.StringBuilder
      var src = 0
      valid.foreach { m =>
        sb.append(s, src, m.start).append("[CARD]"); src = m.end
      }
      sb.append(s, src, s.length)
      (sb.toString, valid.size)
    }
    forAll(cardText) { s =>
      val (wantText, wantN) = refScrub(s)
      TextKernels.cardScrub(UTF8String.fromString(s)).toString == wantText &&
        TextKernels.cardCount(UTF8String.fromString(s)) == wantN
    }
  }
}
