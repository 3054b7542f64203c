package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ×k corpus synthesis for the scale probe: union the base tables k
  * times with RE-KEYED ids, preserving each table's key and content
  * distributions — the honest way to measure how the suite's plans
  * behave one order of magnitude up without new testdata.
  *
  * Distribution-preservation rules (each chosen so the ×k workload is
  * k× the 1× workload, never quadratic in k):
  *
  *  - FACTS AND KEYED CORPORA scale ×k with a per-copy id stride
  *    (`max(id)+1`), foreign keys re-keyed in lockstep (orders ↔
  *    lineitem on orderkey, orders → customer on custkey, events keep
  *    per-user session structure by striding user_id too).
  *  - SMALL DIMS (region, nation, supplier, part) stay 1× — the 100 TB
  *    reality this probe models: facts grow, dims don't. The fact
  *    columns referencing them are NOT re-keyed, so per-dim-key fact
  *    density grows k×, exactly like real growth — and the dim joins
  *    must stay broadcast.
  *  - DOCUMENT TEXT gets a per-copy LETTER tag appended to every word
  *    (letters only — the `\p{L}+` BPE filter must keep accepting
  *    them). Within-copy lexical structure (shingle relations, Jaccard
  *    pairs, BPE statistics) is exactly the base corpus's; cross-copy
  *    shingle spaces are disjoint, so near-dup pair counts scale k×,
  *    not k²× (a plain union would make every document 10-way
  *    identical and the dedup suite quadratic in k — a different
  *    workload, not a bigger one).
  *  - CUSTOMER NAMES get a TWO-letter copy tag: any two tags differ in
  *    both positions, so cross-copy Levenshtein distance is ≥ 2 and
  *    the fuzzy-join pair population scales k× (a one-char tag would
  *    put every name at distance 1 from its 9 siblings).
  *  - EMBEDDINGS are circularly ROTATED by copy index: norm-preserving
  *    and within-copy geometry identical (all 1× cosine structure
  *    survives per copy), cross-copy decorrelated — ANN candidate
  *    populations scale k×, not k²× in collapsed duplicate cells.
  *
  * A `_SCALE_COMPLETE` marker commits after all tables landed (the
  * fixture-gate convention), so repeat probe runs reuse the corpus. */
object ScaleData {

  /** Per-copy letter tag (copy 0 keeps pristine content). */
  private def tag(i: Int): String = ('a' + (i % 26)).toChar.toString

  private def marker(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_SCALE_COMPLETE")

  def exists(spark: SparkSession, dir: String): Boolean =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(marker(dir))

  /** Synthesize the ×k corpus under `outDir` (skipped when the
    * completion marker is present). */
  def synthesize(spark: SparkSession, baseDir: String, outDir: String,
      k: Int): Unit = {
    require(k >= 1 && k <= 26, s"k must be in [1, 26], got $k")
    if (exists(spark, outDir)) return
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def base(t: String): DataFrame =
      spark.read.parquet(s"$baseDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    def strideOf(df: DataFrame, idCol: String): Long =
      df.agg(coalesce(max(col(idCol)), lit(-1L))).head().getLong(0) + 1L

    // 1× dims, copied as-is.
    Seq("region", "nation", "supplier", "part").foreach(t => write(base(t), t))

    // Scaled copies: one unioned plan per table (k branches over the
    // same scan — Spark reuses the exchange; output is k× the input).
    def scaled(df: DataFrame, copy: Int => DataFrame): DataFrame =
      (0 until k).map(copy).reduce(_ unionAll _)

    val cust = base("customer")
    val custStride = strideOf(cust, "c_custkey")
    write(scaled(cust, i => cust.select(
      (col("c_custkey") + i * custStride).as("c_custkey"),
      (if (i == 0) col("c_name")
       else concat(col("c_name"), lit(tag(i) + tag(i)))).as("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))),
      "customer")

    val orders = base("orders")
    val orderStride = strideOf(orders, "o_orderkey")
    write(scaled(orders, i => orders
      .withColumn("o_orderkey", col("o_orderkey") + i * orderStride)
      .withColumn("o_custkey", col("o_custkey") + i * custStride)),
      "orders")

    val li = base("lineitem")
    write(scaled(li, i => li
      .withColumn("l_orderkey", col("l_orderkey") + i * orderStride)),
      "lineitem")

    val ev = base("events")
    val evStride = strideOf(ev, "event_id")
    val userStride = strideOf(ev, "user_id")
    write(scaled(ev, i => ev
      .withColumn("event_id", col("event_id") + i * evStride)
      .withColumn("user_id", col("user_id") + i * userStride)),
      "events")

    val docs = base("documents")
    val docStride = strideOf(docs, "doc_id")
    write(scaled(docs, i => docs.select(
      (col("doc_id") + i * docStride).as("doc_id"),
      (if (i == 0) col("text")
       else array_join(transform(split(col("text"), " "),
         w => concat(w, lit(tag(i)))), " ")).as("text"),
      col("lang"), col("source"), col("n_chars"))),
      "documents")

    val emb = base("embeddings")
    val vecStride = strideOf(emb, "vec_id")
    write(scaled(emb, i => emb.select(
      (col("vec_id") + i * vecStride).as("vec_id"),
      (if (i == 0) col("embedding")
       else concat(
         slice(col("embedding"), lit(i + 1), size(col("embedding")) - i),
         slice(col("embedding"), lit(1), lit(i)))).as("embedding"),
      col("label"))),
      "embeddings")

    fs.create(marker(outDir), true).close()
  }
}
