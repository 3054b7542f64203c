package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/** Document deduplication for training-data pipelines: exact, n-gram
  * Jaccard (inverted-index), MinHash+LSH, and SimHash near-dup.
  *
  * Scale design (the point of these ops at 100 TB):
  *  - NOTHING here is pairwise over the corpus. Candidate generation always
  *    goes through a shuffle-on-key inverted index (shared shingle, LSH
  *    band bucket, or SimHash band), so cost is O(candidates), not O(n²).
  *  - Signatures are computed columnar (`transform`/`aggregate` over token
  *    arrays) inside whole-stage codegen — one scan, no explode until the
  *    (much smaller) banding step.
  *  - Exact verification (true Jaccard / Hamming) runs only on candidate
  *    pairs, joined back by id — the classic filter-verify pattern.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: canonical representative (min id) per identical text.
    * Plain hash aggregation — Spark's partial/final agg handles any scale.
    * The group key is the 128-bit MD5 fingerprint of the text, not the text
    * itself, so the shuffle sorts/compares 16-byte keys instead of full
    * documents; the text rides along as a `first` aggregate (identical
    * within a group, and map-side partial agg collapses duplicates before
    * anything crosses the wire). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("_fp"))
      .agg(min(idCol).as(idCol), first(textCol).as(textCol))
      .select(idCol, textCol)

  // ------------------------------------------------------------- shingles

  /** Word n-gram shingles (distinct), computed columnar. Documents shorter
    * than `n` tokens yield their whole text as a single shingle. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(text)
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => array_join(slice(toks, i + 1, lit(n)), " "))
    array_distinct(
      when(size(toks) >= n, grams).otherwise(array(array_join(toks, " "))))
  }

  /** Exact Jaccard over two distinct-shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b))

  // ---------------------------------------- exact n-gram Jaccard (inverted)

  /** Exact n-gram Jaccard near-dup pairs via an inverted shingle index:
    * explode distinct shingles → self-join on shingle (skipping shingles
    * with document frequency > `maxDf`, the standard stop-shingle prune) →
    * shared counts per pair → Jaccard ≥ `threshold`.
    *
    * The `maxDf` prune bounds the quadratic blowup on ubiquitous shingles;
    * a pair is only missed if ALL its shared shingles are ubiquitous. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDf: Int = 100): DataFrame = {
    // Shingling is the expensive projection and feeds four consumers
    // (sizes ×2 join sides, postings ×2 self-join sides) — persist so it
    // runs once instead of being re-inlined into every consumer by
    // projection collapse.
    val sh = df.select(col(idCol).as("id"),
      shingles(col(textCol), n).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.select(col("id"), size(col("sh")).as("n_sh"))
    val inv = sh.select(col("id"), explode(col("sh")).as("s"))
    val rare = inv.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2)
    val postings = inv.join(rare.select("s"), Seq("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val shared = postings.as("a")
      .join(postings.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("n_sh", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b")
        .withColumnRenamed("n_sh", "n_b"), Seq("id_b"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SQL twin of [[ngramJaccardPairs]] for the DuckDB oracle (documents
    * table, 3-gram shingles). */
  def ngramJaccardPairsSql(n: Int, threshold: Double, maxDf: Int = 100): String = {
    val toks = "string_split(text, ' ')"
    val grams = s"list_transform(range(1, greatest(len($toks) - ${n - 1}, 0) + 1), " +
      s"i -> array_to_string($toks[i:i+${n - 1}], ' '))"
    val sh = s"list_distinct(CASE WHEN len($toks) >= $n THEN $grams " +
      s"ELSE [array_to_string($toks, ' ')] END)"
    s"""WITH sh AS (SELECT doc_id AS id, $sh AS sh FROM documents),
       |sizes AS (SELECT id, len(sh) AS n_sh FROM sh),
       |inv AS (SELECT id, unnest(sh) AS s FROM sh),
       |rare AS (SELECT s FROM inv GROUP BY s
       |         HAVING COUNT(*) <= $maxDf AND COUNT(*) >= 2),
       |postings AS (SELECT inv.id, inv.s FROM inv JOIN rare USING (s)),
       |shared AS (SELECT a.id AS id_a, b.id AS id_b,
       |             CAST(COUNT(*) AS BIGINT) AS shared
       |           FROM postings a JOIN postings b
       |             ON a.s = b.s AND a.id < b.id
       |           GROUP BY a.id, b.id)
       |SELECT id_a, id_b,
       |  CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) AS jaccard
       |FROM shared
       |JOIN sizes sa ON sa.id = id_a
       |JOIN sizes sb ON sb.id = id_b
       |WHERE CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) >= $threshold""".stripMargin
  }

  /** True-Jaccard pair oracle (DuckDB): exhaustive id_a < id_b cross join
    * with exact list intersection/union — the semantic ground truth that
    * [[minhashNearDup]]'s filter-verify pipeline must reproduce. Only
    * viable at oracle scale (quadratic); the LSH path is the scale plan. */
  def trueJaccardPairsSql(n: Int, threshold: Double): String = {
    val toks = "string_split(text, ' ')"
    val grams = s"list_transform(range(1, greatest(len($toks) - ${n - 1}, 0) + 1), " +
      s"i -> array_to_string($toks[i:i+${n - 1}], ' '))"
    val sh = s"list_distinct(CASE WHEN len($toks) >= $n THEN $grams " +
      s"ELSE [array_to_string($toks, ' ')] END)"
    s"""WITH sh AS (SELECT doc_id AS id, $sh AS sh FROM documents),
       |pairs AS (SELECT a.id AS id_a, b.id AS id_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
       |  FROM sh a JOIN sh b ON a.id < b.id)
       |SELECT id_a, id_b, jaccard FROM pairs
       |WHERE jaccard >= $threshold""".stripMargin
  }

  // ------------------------------------------------------- MinHash + LSH

  /** Large prime modulus for the affine MinHash family (fits 31 bits so
    * `a*h+b` never overflows a long). */
  val MinhashP: Long = 2147483647L

  /** Seeded affine hash family params, deterministic across runs. */
  def hashFamily(numHashes: Int, seed: Long): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = Seq.fill(numHashes)(1L + math.abs(rnd.nextLong()) % (MinhashP - 1))
    val bs = Seq.fill(numHashes)(math.abs(rnd.nextLong()) % MinhashP)
    (as, bs)
  }

  /** MinHash signature (array of `numHashes` minima) over a shingle array,
    * fully columnar and single-pass: h_i(s) = (a_i · xxhash64(s) + b_i)
    * mod P.
    *
    * Structured as one `aggregate` over the shingle array with an array
    * accumulator of running minima: each shingle is string-hashed exactly
    * once, then folded into all `numHashes` minima with a `zip_with`
    * against the (a, b) parameter array. The naive transpose — `transform`
    * over hash indices, each re-scanning the shingles — re-evaluates
    * `xxhash64` numHashes× per shingle, which is the difference between
    * O(S) and O(S·H) string hashing per document. */
  def minhashSignature(shinglesCol: Column, numHashes: Int, seed: Long): Column = {
    val (as, bs) = hashFamily(numHashes, seed)
    val params = typedlit(as.zip(bs))
    val hashes = transform(shinglesCol, s => pmod(xxhash64(s), lit(MinhashP)))
    aggregate(
      hashes,
      array_repeat(lit(MinhashP), numHashes),
      (acc, h) => zip_with(acc, params, (m, p) =>
        least(m, pmod(p.getField("_1") * h + p.getField("_2"), lit(MinhashP)))))
  }

  /** LSH band keys: signature split into `bands` bands of
    * `numHashes/bands` rows each; key = band index + joined values. */
  def lshBandKeys(sigCol: Column, numHashes: Int, bands: Int): Column = {
    val r = numHashes / bands
    transform(sequence(lit(0), lit(bands - 1)), j =>
      concat_ws(":", j.cast("string"),
        array_join(transform(slice(sigCol, j * r + 1, lit(r)), _.cast("string")), "_")))
  }

  /** MinHash/LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * Pipeline: shingle → signature (columnar) → explode band keys →
    * self-join on band key (the only shuffle that matters; key cardinality
    * ≈ corpus size × bands, heavily skew-resistant because identical bands
    * are precisely the near-dup candidates) → distinct candidate pairs →
    * join back for exact Jaccard ≥ `threshold`. */
  def minhashNearDup(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    // Persist the shingle projection (reused by both verify join-backs and
    // the signature) and the banded keys (reused by both self-join sides).
    // Without the materialization barriers, projection collapse inlines the
    // full signature expression into every band key and both join sides —
    // recomputing the whole signature ~bands× per row, measured as a >30×
    // slowdown at sf0.1.
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = sh
      .withColumn("sig", minhashSignature(col("sh"), numHashes, seed))
      .select(col("id"),
        explode(lshBandKeys(col("sig"), numHashes, bands)).as("band"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------------------- SimHash

  /** 64-bit SimHash per document: explode tokens, per-bit ±1 sums, sign →
    * bit. One shuffle on the id (same key as any per-doc agg). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$i"))
    val packed = (0 until 64).map(i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L))
      .reduce(_ + _)
    tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), packed.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming` (must be
    * ≤ 3): band join on 4×16-bit chunks (pigeonhole: ≤3 differing bits ⇒ at
    * least one identical 16-bit band), then exact `bit_count(xor)` verify.
    * Recall is exact for maxHamming ≤ 3 — a pair with more differing bits
    * could spread them across all four bands, so larger radii are refused
    * rather than silently under-recalled. */
  def simhashNearDup(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4-band pigeonhole guarantees recall only for maxHamming <= 3, got $maxHamming")
    val sh = simhash(df, idCol, textCol)
    // shiftright takes a literal Int shift — unroll the four bands.
    val bandArr = array((0 until 4).map(j =>
      shiftright(col("simhash"), j * 16).bitwiseAND(lit(0xFFFFL))): _*)
    // simhash() shuffles (token explode + 64-sum agg); persist the banded
    // result so the self-join reads it once instead of re-running the
    // aggregation for each side.
    val bands = sh.select(col("id"), col("simhash"), posexplode(bandArr))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
      .persist(StorageLevel.MEMORY_AND_DISK)
    bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
