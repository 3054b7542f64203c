package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document text kernels for the dedup hot paths.
  *
  * Both operations are expressible with built-ins (`split` + `transform`
  * lambdas, or an explode + 64-column aggregation), but those forms either
  * evaluate as interpreted higher-order functions or generate huge
  * aggregation methods — measured as the dominant cost of the dedup tier.
  * A tight per-row loop over the document's UTF-8 bytes does the same work
  * in microseconds, stays inside whole-stage codegen (the generated code
  * is a single static call), and needs no shuffle at all for SimHash.
  *
  * Tokenization contract: single-space splitting, identical to
  * `split(text, " ")` with trailing/empty tokens preserved — splitting on
  * the 0x20 byte is UTF-8-safe (continuation bytes are ≥ 0x80). MinHash
  * shingle hashes reuse Spark's own XXH64 with the builtin `xxhash64` seed,
  * so values are bit-identical to the built-in-composed formulation
  * (verified in DedupSpec); SimHash token hashes are MD5-derived
  * ([[md5First8LE]]) so the whole SimHash pipeline has an exact DuckDB
  * oracle twin.
  */
object TextKernels {

  private val XxSeed = 42L

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of MD5(bytes[off, off+len)) interpreted little-endian —
    * bit-identical to DuckDB's `md5_number_upper`, which is what makes the
    * SimHash pipeline oracle-expressible in plain SQL. */
  def md5First8LE(b: Array[Byte], off: Int, len: Int): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(b, off, len)
    val d = md.digest()
    var h = 0L
    var i = 7
    while (i >= 0) { h = (h << 8) | (d(i) & 0xFFL); i -= 1 }
    h
  }

  /** 64-bit SimHash of a single-space-tokenized document: per-token 64-bit
    * hash (MD5 first half, little-endian — see [[md5First8LE]]), ±1 per bit
    * position, sign → bit. Identical semantics to explode-tokens + 64
    * conditional sums + sign-pack over the same per-token hash. */
  def simhash64(text: UTF8String): Long = {
    val b = text.getBytes
    val counts = new Array[Int](64)
    var start = 0
    var i = 0
    val len = b.length
    while (i <= len) {
      if (i == len || b(i) == 0x20) {
        val h = md5First8LE(b, start, i - start)
        var k = 0
        while (k < 64) {
          counts(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
          k += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) > 0) out |= (1L << k)
      k += 1
    }
    out
  }

  /** Word n-gram shingles (with duplicates; caller dedups): tokens joined
    * by single spaces, n at a time; documents shorter than n tokens yield
    * the whole token sequence as one shingle. Byte-identical to
    * `transform(sequence(...), i -> array_join(slice(tokens, i, n), " "))`
    * with the same short-document fallback. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val b = text.getBytes
    val len = b.length
    // Token boundaries: starts(i) .. ends(i) (exclusive).
    var t = 1
    var i = 0
    while (i < len) { if (b(i) == 0x20) t += 1; i += 1 }
    val starts = new Array[Int](t)
    val ends = new Array[Int](t)
    var ti = 0
    var s = 0
    i = 0
    while (i <= len) {
      if (i == len || b(i) == 0x20) { starts(ti) = s; ends(ti) = i; ti += 1; s = i + 1 }
      i += 1
    }
    def joined(from: Int, until: Int): UTF8String = {
      // Tokens from..until-1 joined with single spaces: contiguous bytes
      // from starts(from) to ends(until-1) re-joined explicitly so the
      // result is canonical even for non-single-spaced input.
      var size = until - from - 1
      var j = from
      while (j < until) { size += ends(j) - starts(j); j += 1 }
      val out = new Array[Byte](math.max(size, 0))
      var pos = 0
      j = from
      while (j < until) {
        if (j > from) { out(pos) = 0x20; pos += 1 }
        val l = ends(j) - starts(j)
        System.arraycopy(b, starts(j), out, pos, l)
        pos += l
        j += 1
      }
      UTF8String.fromBytes(out)
    }
    if (t < n) {
      new GenericArrayData(Array[Any](joined(0, t)))
    } else {
      val grams = new Array[Any](t - n + 1)
      var g = 0
      while (g <= t - n) { grams(g) = joined(g, g + n); g += 1 }
      new GenericArrayData(grams)
    }
  }

  /** Tokens ∈ `words` in one byte-scan: split on the 0x20 byte (identical
    * to `split(text, " ")` — empty tokens included, never in a word set),
    * test each token against the set without copying (UTF8String slices
    * share the backing array). Semantics identical to the
    * `size(filter(tokens(c), t => t.isInCollection(words)))` higher-order
    * form, which Spark evaluates as an interpreted per-element lambda —
    * this kernel is the codegen'd replacement feeding stopwordRatio /
    * qualityScore / langId on every documents row. */
  def markerHits(text: UTF8String, words: java.util.HashSet[UTF8String]): Int = {
    val b = text.getBytes
    val len = b.length
    var hits = 0
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || b(i) == 0x20) {
        if (i > start &&
            words.contains(UTF8String.fromBytes(b, start, i - start))) hits += 1
        start = i + 1
      }
      i += 1
    }
    hits
  }

  /** Rolling polynomial fingerprint `acc = (acc*31 + codepoint) mod 1e9+7`
    * over the string's Unicode code points, left to right — bit-identical
    * to the `aggregate(transform(split(c, ""), ch => ascii(ch)), …)`
    * higher-order form (Spark's `ascii` returns `codePointAt(0)`, and
    * regex split-on-empty never splits inside a code point) and to the
    * DuckDB `list_reduce` twin, without the per-character array element +
    * interpreted lambda call the HOF form allocates. Empty input → 0,
    * matching `ascii('') = 0` folded once from the HOF's `[""]` split. */
  def polyFingerprint(text: UTF8String): Long = {
    val b = text.getBytes
    val len = b.length
    var acc = 0L
    var i = 0
    while (i < len) {
      val b0 = b(i) & 0xFF
      var cp = 0
      var n = 1
      if (b0 < 0x80) { cp = b0 }
      else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; n = 2 }
      else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; n = 3 }
      else { cp = b0 & 0x07; n = 4 }
      var k = 1
      while (k < n && i + k < len) { cp = (cp << 6) | (b(i + k) & 0x3F); k += 1 }
      acc = java.lang.Math.floorMod(acc * 31L + cp, 1000000007L)
      i += n
    }
    acc
  }

  /** MinHash band keys per document in one pass: hash each shingle once
    * (Spark's XXH64, builtin seed), fold all `numHashes` affine minima,
    * emit the `bands` LSH keys as `"j:v_v_…"` strings. Identical values
    * to the explode + 64-min-aggregation formulation (asserted in
    * DedupSpec) with none of its plan surface: no explode, no wide
    * aggregation method for the JIT to refuse, no shuffle. */
  def minhashBands(sh: ArrayData, as: Array[Long], bs: Array[Long],
      bands: Int, p: Long): ArrayData = {
    val numHashes = as.length
    val mins = Array.fill(numHashes)(p)
    val nSh = sh.numElements()
    var i = 0
    while (i < nSh) {
      val h = java.lang.Math.floorMod(
        XXH64.hashUTF8String(sh.getUTF8String(i), XxSeed), p)
      var k = 0
      while (k < numHashes) {
        val v = java.lang.Math.floorMod(as(k) * h + bs(k), p)
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    val r = numHashes / bands
    val out = new Array[Any](bands)
    var j = 0
    while (j < bands) {
      val sb = new java.lang.StringBuilder
      sb.append(j).append(':')
      var q = 0
      while (q < r) {
        if (q > 0) sb.append('_')
        sb.append(mins(j * r + q))
        q += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Intersection size of two SORTED string arrays by linear merge —
    * O(n+m) with zero allocation, vs `size(array_intersect(a, b))` which
    * builds a hash set of boxed UTF8Strings per ROW (measured at 2.3×
    * this kernel's cost over the prefix-join's candidate pairs).
    * Order must be Spark's default binary string order (`array_sort`);
    * with distinct elements (shingle arrays are `array_distinct`'d) the
    * count equals the set-intersection size, so Jaccard falls out as
    * `c / (|a| + |b| − c)` with no union array ever materialized. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Sorted-intersect-count expression: `(array<string>, array<string>) →
    * int`, one codegen'd static call. */
  case class SortedIntersectExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "sorted_intersect_count"
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count expects two array<string>, got " +
            s"${l.catalogString}, ${r.catalogString}")
      }
    override protected def nullSafeEval(a: Any, b: Any): Any =
      sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.TextKernels.sortedIntersectCount($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def sortedIntersectCol(a: Column, b: Column): Column =
    GraftSql.column(SortedIntersectExpr(
      GraftSql.expression(a), GraftSql.expression(b)))

  /** Lower bound (inclusive) of `key` in `b[lo, hi)` — first index whose
    * element compares ≥ key. */
  private def lowerBound(b: ArrayData, lo: Int, hi: Int, key: UTF8String): Int = {
    var l = lo
    var h = hi
    while (l < h) {
      val m = (l + h) >>> 1
      if (b.getUTF8String(m).compareTo(key) < 0) l = m + 1 else h = m
    }
    l
  }

  /** Divide-and-conquer overlap upper bound on two sorted ranges — the
    * suffix-filter subroutine of Xiao et al., "Efficient Similarity Joins
    * for Near Duplicate Detection" (WWW 2008): probe `a`'s median in `b`
    * (binary search), split both ranges there, recurse to `depth`; at the
    * leaves the bound is `min(len_a, len_b)`. Sound because a common
    * total order means elements below the pivot in one array can only
    * match below it in the other. Cost O(2^depth · log n) vs the merge's
    * O(n + m). */
  private def overlapBound(a: ArrayData, aLo: Int, aHi: Int,
      b: ArrayData, bLo: Int, bHi: Int, depth: Int): Int = {
    val la = aHi - aLo
    val lb = bHi - bLo
    if (la <= 0 || lb <= 0) 0
    else if (depth == 0 || la == 1) math.min(la, lb)
    else {
      val mid = (aLo + aHi) >>> 1
      val pivot = a.getUTF8String(mid)
      val pos = lowerBound(b, bLo, bHi, pivot)
      val hit = pos < bHi && b.getUTF8String(pos).compareTo(pivot) == 0
      overlapBound(a, aLo, mid, b, bLo, pos, depth - 1) +
        (if (hit) 1 else 0) +
        overlapBound(a, mid + 1, aHi, b, if (hit) pos + 1 else pos, bHi,
          depth - 1)
    }
  }

  /** [[sortedIntersectCount]] with a required-overlap floor: returns the
    * EXACT intersection size when it is ≥ `minRequired`, −1 otherwise
    * (possibly without ever scanning the arrays). Two exact prunes run
    * before the merge: the WWW'08 suffix-filter bound ([[overlapBound]],
    * depth 3 → ≤ 7 binary-search probes) and, inside the merge itself,
    * early abandon — bail the moment `c + min(remaining_a, remaining_b)`
    * can no longer reach the floor. For the Jaccard verify the floor is
    * `⌈t/(1+t)·(|a|+|b|)⌉`, so near-miss candidate pairs — the bulk, by
    * construction, after prefix filtering — cost O(log) not O(n). */
  def boundedSortedIntersectCount(a: ArrayData, b: ArrayData,
      minRequired: Int): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    if (math.min(na, nb) < minRequired) return -1
    if (overlapBound(a, 0, na, b, 0, nb, 3) < minRequired) return -1
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      if (c + math.min(na - i, nb - j) < minRequired) return -1
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    if (c >= minRequired) c else -1
  }

  /** Bounded sorted-intersect expression:
    * `(array<string>, array<string>, int) → int` (exact count, or −1 when
    * provably under the floor), one codegen'd static call. */
  case class BoundedSortedIntersectExpr(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "bounded_sorted_intersect_count"
    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (ArrayType(StringType, _), ArrayType(StringType, _), IntegerType) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r, m) => TypeCheckResult.TypeCheckFailure(
          s"bounded_sorted_intersect_count expects (array<string>, " +
            s"array<string>, int), got ${l.catalogString}, " +
            s"${r.catalogString}, ${m.catalogString}")
      }
    override protected def nullSafeEval(a: Any, b: Any, m: Any): Any =
      boundedSortedIntersectCount(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], m.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b, m) =>
        s"graft.functions.TextKernels.boundedSortedIntersectCount($a, $b, $m)")
    override protected def withNewChildrenInternal(newFirst: Expression,
        newSecond: Expression, newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  def boundedSortedIntersectCol(a: Column, b: Column, minRequired: Column): Column =
    GraftSql.column(BoundedSortedIntersectExpr(GraftSql.expression(a),
      GraftSql.expression(b), GraftSql.expression(minRequired)))

  /** MinHash-bands expression: `array<string> → array<string>` (hash
    * family fixed at plan time). */
  case class MinhashBandsExpr(child: Expression, as: Seq[Long], bs: Seq[Long],
      bands: Int, p: Long) extends UnaryExpression {
    require(as.length == bs.length && as.nonEmpty && as.length % bands == 0)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "minhash_bands"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"minhash_bands expects array<string>, got ${other.catalogString}")
      }
    private lazy val asArr = as.toArray
    private lazy val bsArr = bs.toArray
    override protected def nullSafeEval(input: Any): Any =
      minhashBands(input.asInstanceOf[ArrayData], asArr, bsArr, bands, p)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val asRef = ctx.addReferenceObj("minhashAs", asArr, "long[]")
      val bsRef = ctx.addReferenceObj("minhashBs", bsArr, "long[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextKernels.minhashBands($c, $asRef, $bsRef, $bands, ${p}L)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def minhashBandsCol(sh: Column, as: Seq[Long], bs: Seq[Long],
      bands: Int, p: Long): Column =
    GraftSql.column(MinhashBandsExpr(GraftSql.expression(sh), as, bs, bands, p))

  /** SimHash expression: `text → long`, codegen'd as one static call. */
  case class SimhashExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects string, got ${child.dataType.catalogString}")
    override protected def nullSafeEval(input: Any): Any =
      simhash64(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhash64($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Shingles expression: `text → array<string>` (n fixed at plan time). */
  case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_shingles"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects string, got ${child.dataType.catalogString}")
    override protected def nullSafeEval(input: Any): Any =
      shingles(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.shingles($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Byte-syms expression: `text → array<string>` ([[byteSyms]]). */
  case class ByteSymsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "byte_syms"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"byte_syms expects string, got ${child.dataType.catalogString}")
    override protected def nullSafeEval(input: Any): Any =
      byteSyms(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.byteSyms($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Marker-hits expression: `text → int` (word set fixed at plan time). */
  case class MarkerHitsExpr(child: Expression, words: Seq[String])
      extends UnaryExpression {
    require(words.nonEmpty, "marker_hits needs a non-empty word set")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "marker_hits"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"marker_hits expects string, got ${child.dataType.catalogString}")
    @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](words.size * 2)
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }
    override protected def nullSafeEval(input: Any): Any =
      markerHits(input.asInstanceOf[UTF8String], wordSet)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val setRef = ctx.addReferenceObj("markerWords", wordSet, "java.util.HashSet")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextKernels.markerHits($c, $setRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Poly-fingerprint expression: `text → long`, one static call. */
  case class PolyFingerprintExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "poly_fingerprint"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"poly_fingerprint expects string, got ${child.dataType.catalogString}")
    override protected def nullSafeEval(input: Any): Any =
      polyFingerprint(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.polyFingerprint($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def simhashCol(text: Column): Column =
    GraftSql.column(SimhashExpr(GraftSql.expression(text)))

  /** GPT-2 bytes-to-unicode table (Radford et al. 2019, the public
    * `encoder.py` `bytes_to_unicode`): a BIJECTION from each of the 256
    * byte values to a printable BMP codepoint — visually-safe bytes
    * (0x21-0x7E, 0xA1-0xAC, 0xAE-0xFF) map to themselves, the rest
    * (controls, space, 0x7F, 0xA0, 0xAD) to 0x100+k in byte order. A
    * byte-level tokenizer runs BPE over these CHARS, so no byte of any
    * script is ever unrepresentable — the property the codepoint-level
    * `\p{L}+` word tokenizer lacks. Public so the oracle twin can carry
    * the same 256 rows as a literal table and the spec can invert it. */
  val byteToChar: Array[String] = {
    val keep = ((0x21 to 0x7e) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    var n = 0
    Array.tabulate(256) { b =>
      if (keep(b)) String.valueOf(b.toChar)
      else { val s = String.valueOf((0x100 + n).toChar); n += 1; s }
    }
  }

  private val byteSymsTable: Array[UTF8String] =
    byteToChar.map(UTF8String.fromString)

  /** A string's UTF-8 bytes mapped through [[byteToChar]], one symbol
    * per byte — the byte-level BPE initial symbol sequence (no
    * end-of-word marker; GPT-2's space-prefix convention carries word
    * boundaries instead). One tight byte loop, codegen'd static call. */
  def byteSyms(text: UTF8String): ArrayData = {
    val b = text.getBytes
    val out = new Array[Any](b.length)
    var i = 0
    while (i < b.length) {
      out(i) = byteSymsTable(b(i) & 0xff)
      i += 1
    }
    new GenericArrayData(out)
  }

  def shinglesCol(text: Column, n: Int): Column =
    GraftSql.column(ShinglesExpr(GraftSql.expression(text), n))

  def byteSymsCol(text: Column): Column =
    GraftSql.column(ByteSymsExpr(GraftSql.expression(text)))

  def markerHitsCol(text: Column, words: Seq[String]): Column =
    GraftSql.column(MarkerHitsExpr(GraftSql.expression(text), words))

  def polyFingerprintCol(text: Column): Column =
    GraftSql.column(PolyFingerprintExpr(GraftSql.expression(text)))

  /** Unicode NFC normalization (UAX #15 canonical composition) of a
    * document. The same logical content crawled from two sources
    * routinely differs only in normal form (decomposed `e`+U+0301 vs
    * precomposed U+00E9 — macOS filesystems and some CMSes emit NFD),
    * and every byte-keyed stage downstream (exact dedup's md5 groups,
    * shingle hashes, BPE byte symbols) sees those as distinct content —
    * so normalization is the FIRST text transform of a production
    * pipeline, before any fingerprint is taken.
    *
    * `Normalizer.isNormalized` is the UAX #15 quick-check — for ASCII
    * and already-NFC text (the overwhelming majority of a real crawl)
    * it is a single scan with zero allocation, so the kernel adds ~one
    * branch per row to a 100 TB pass. Only strings that actually carry
    * decomposed sequences pay the compose. Java's Normalizer and
    * DuckDB's `nfc_normalize` (utf8proc) both implement UAX #15
    * canonical composition, which is what makes the whole operator
    * oracle-expressible ([[NfcNormalizeExpr]] stays codegen'd either
    * way). */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** NFC-normalize expression: `text → text`, one static call. */
  case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${child.dataType.catalogString}")
    override protected def nullSafeEval(input: Any): Any =
      nfcNormalize(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.nfcNormalize($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def nfcNormalizeCol(text: Column): Column =
    GraftSql.column(NfcNormalizeExpr(GraftSql.expression(text)))

  /** Per-row character-entropy statistics over an already-split token
    * array: `(n_chars, term_sum)` where `n_chars` is the element count
    * and `term_sum` replays `CAST(SUM(CAST(cnt*ln(cnt) AS
    * DECIMAL(28,6))) AS DOUBLE)` over the per-distinct-token counts —
    * BIT-IDENTICAL to the explode → groupBy(doc, ch) →
    * [[graft.engine.Aggregates.sumExact]] formulation it replaces
    * (each term is the same double, converted by Spark's own
    * [[org.apache.spark.sql.types.Decimal]] with the same
    * changePrecision(28, 6) rounding, summed exactly; decimal addition
    * is order-insensitive, so a one-row loop equals the distributed
    * sum). Taking the SPLIT ARRAY rather than the raw text keeps
    * tokenization Spark's own `split(text, "")` — the kernel never
    * re-implements code-point segmentation. Replacing the aggregation
    * with a projection removes a corpus-bytes explode and two
    * exchanges from every entropy consumer (q203, the q209/q214
    * pipeline gate): at 100 TB that was one row PER CHARACTER through
    * a hash exchange. */
  def entropyStats(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, java.lang.Long](64)
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      counts.merge(tok, java.lang.Long.valueOf(1L), (a, b) =>
        java.lang.Long.valueOf(a.longValue() + b.longValue()))
      i += 1
    }
    var acc = java.math.BigDecimal.ZERO
    val it = counts.values().iterator()
    while (it.hasNext) {
      val k = it.next().longValue()
      val term = k.toDouble * java.lang.Math.log(k.toDouble)
      // Spark's Cast(double -> DECIMAL(28,6)): Decimal(d) then
      // changePrecision — reuse Spark's own Decimal so the rounding can
      // never drift from the aggregation twin.
      val dec = org.apache.spark.sql.types.Decimal(term)
      if (!dec.changePrecision(28, 6))
        throw new ArithmeticException(s"entropy term overflow: $term")
      acc = acc.add(dec.toJavaBigDecimal)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, acc.doubleValue()))
  }

  /** Entropy-stats expression: `array<string> → struct<n_chars: long,
    * term_sum: double>` ([[entropyStats]]), one static call. */
  case class EntropyStatsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_chars", LongType,
        nullable = false),
      org.apache.spark.sql.types.StructField("term_sum",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    override def prettyName: String = "entropy_stats"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"entropy_stats expects array<string>, got ${other.catalogString}")
    }
    override protected def nullSafeEval(input: Any): Any =
      entropyStats(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.entropyStats($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def entropyStatsCol(tokens: Column): Column =
    GraftSql.column(EntropyStatsExpr(GraftSql.expression(tokens)))

  /** Luhn checksum (ISO/IEC 7812) over `len` ASCII digit bytes at
    * `off`: rightmost digit plain, every second digit doubled with
    * 9-wrap; valid iff the sum is ≡ 0 (mod 10). The validation every
    * payment-card format check runs — a 16-digit order number passes a
    * `\d{16}` regex but fails Luhn with probability 0.9, which is
    * exactly why a PII scrubber must checksum before redacting. */
  def luhnValid(b: Array[Byte], off: Int, len: Int): Boolean = {
    var sum = 0
    var i = 0
    while (i < len) {
      var d = b(off + len - 1 - i) - '0'
      if (i % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      i += 1
    }
    sum % 10 == 0
  }

  /** Candidate card runs of `text`: MAXIMAL ASCII-digit runs of length
    * exactly [[CardDigits]] (a 17-digit run is not a card — same
    * semantics as the boundary-guarded regex the twins use, since a
    * longer run fails both). Calls `f(off, len)` per candidate. */
  private def forEachCardRun(b: Array[Byte])(f: (Int, Int) => Unit): Unit = {
    var i = 0
    while (i < b.length) {
      if (b(i) >= '0' && b(i) <= '9') {
        var j = i
        while (j < b.length && b(j) >= '0' && b(j) <= '9') j += 1
        if (j - i == CardDigits) f(i, j - i)
        i = j
      } else i += 1
    }
  }

  val CardDigits = 16
  private val CardMask = "[CARD]".getBytes("UTF-8")

  /** Replace every LUHN-VALID 16-digit run with `[CARD]`, one byte
    * scan; invalid runs (order numbers, hashes) pass through untouched.
    * Output is never longer than the input, so one exact-size copy. */
  def cardScrub(text: UTF8String): UTF8String = {
    val b = text.getBytes
    val out = new Array[Byte](b.length)
    var (src, dst) = (0, 0)
    forEachCardRun(b) { (off, len) =>
      if (luhnValid(b, off, len)) {
        System.arraycopy(b, src, out, dst, off - src); dst += off - src
        System.arraycopy(CardMask, 0, out, dst, CardMask.length)
        dst += CardMask.length
        src = off + len
      }
    }
    System.arraycopy(b, src, out, dst, b.length - src)
    dst += b.length - src
    UTF8String.fromBytes(java.util.Arrays.copyOfRange(out, 0, dst))
  }

  /** Count of Luhn-VALID 16-digit runs (the redaction count the audit
    * column carries next to the raw candidate count). */
  def cardCount(text: UTF8String): Int = {
    val b = text.getBytes
    var n = 0
    forEachCardRun(b)((off, len) => if (luhnValid(b, off, len)) n += 1)
    n
  }

  /** Card-scrub expression: `text → text`, one static call. */
  case class CardScrubExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "card_scrub"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"card_scrub expects string, got ${child.dataType.catalogString}")
    override protected def nullSafeEval(input: Any): Any =
      cardScrub(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.cardScrub($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Card-count expression: `text → int`, one static call. */
  case class CardCountExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "card_count"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"card_count expects string, got ${child.dataType.catalogString}")
    override protected def nullSafeEval(input: Any): Any =
      cardCount(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.cardCount($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def cardScrubCol(text: Column): Column =
    GraftSql.column(CardScrubExpr(GraftSql.expression(text)))

  def cardCountCol(text: Column): Column =
    GraftSql.column(CardCountExpr(GraftSql.expression(text)))

  /** Greedy left-to-right NON-OVERLAPPING BPE merge of adjacent
    * `(lhs, rhs)` symbol pairs — the imperative twin of the fold
    * `acc.last == lhs && x == rhs ? replace-last(lhs+rhs) : append(x)`
    * (Sennrich BPE's one rewrite). The merged token `lhs+rhs` can
    * never equal `lhs` (rhs nonempty), so a merge never cascades
    * within one application — exactly the fold's semantics. A null
    * element never matches and passes through. */
  def bpeMerge(syms: ArrayData, lhs: UTF8String, rhs: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new Array[AnyRef](n)
    var m = 0
    var i = 0
    while (i < n) {
      val x = if (syms.isNullAt(i)) null else syms.getUTF8String(i)
      if (m > 0 && x != null && rhs.equals(x) && out(m - 1) != null &&
          lhs.equals(out(m - 1))) {
        out(m - 1) = UTF8String.concat(lhs, rhs)
      } else { out(m) = x; m += 1 }
      i += 1
    }
    new GenericArrayData(
      if (m == n) out else java.util.Arrays.copyOf(out, m))
  }

  /** BPE-merge expression: `array<string> → array<string>` with the
    * (lhs, rhs) pair fixed at plan time, codegen'd as one static call.
    * Replaces the `aggregate` higher-order-function spelling in the
    * trainer's per-round rewrite: HOFs evaluate INTERPRETED (per-symbol
    * virtual `Expression.eval` dispatch), the documented positional-JIT
    * hazard class once a long bench run has polluted those call-site
    * profiles — a static monomorphic kernel stays inside whole-stage
    * codegen instead. */
  case class BpeMergeExpr(child: Expression, lhs: String, rhs: String)
      extends UnaryExpression {
    require(lhs.nonEmpty && rhs.nonEmpty, "BPE merge symbols are nonempty")
    override def dataType: DataType = child.dataType
    override def prettyName: String = "bpe_merge"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"bpe_merge expects array<string>, got ${other.catalogString}")
      }
    private lazy val lhsU = UTF8String.fromString(lhs)
    private lazy val rhsU = UTF8String.fromString(rhs)
    override protected def nullSafeEval(input: Any): Any =
      bpeMerge(input.asInstanceOf[ArrayData], lhsU, rhsU)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lRef = ctx.addReferenceObj("bpeLhs", lhsU,
        "org.apache.spark.unsafe.types.UTF8String")
      val rRef = ctx.addReferenceObj("bpeRhs", rhsU,
        "org.apache.spark.unsafe.types.UTF8String")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextKernels.bpeMerge($c, $lRef, $rRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def bpeMergeCol(syms: Column, lhs: String, rhs: String): Column =
    GraftSql.column(BpeMergeExpr(GraftSql.expression(syms), lhs, rhs))

  /** Adjacent symbol pairs of one word: `[a b c] → [(a,b), (b,c)]` —
    * the per-round pair statistic every BPE trainer aggregates. Null
    * elements pass through as null struct fields. */
  def adjacentPairs(syms: ArrayData): ArrayData = {
    val n = syms.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](n - 1)
    var prev: AnyRef = if (syms.isNullAt(0)) null else syms.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur: AnyRef = if (syms.isNullAt(i)) null else syms.getUTF8String(i)
      out(i - 1) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](prev, cur))
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Adjacent-pairs expression: `array<string> →
    * array<struct<lhs string, rhs string>>`, one static call inside
    * whole-stage codegen — replaces the
    * `transform(sequence(...), element_at ×2)` interpreted-HOF
    * spelling on the trainer's hot path. */
  case class AdjacentPairsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("lhs", StringType),
        org.apache.spark.sql.types.StructField("rhs", StringType))),
      containsNull = false)
    override def prettyName: String = "adjacent_pairs"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"adjacent_pairs expects array<string>, got ${other.catalogString}")
      }
    override protected def nullSafeEval(input: Any): Any =
      adjacentPairs(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextKernels.adjacentPairs($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def adjacentPairsCol(syms: Column): Column =
    GraftSql.column(AdjacentPairsExpr(GraftSql.expression(syms)))
}
