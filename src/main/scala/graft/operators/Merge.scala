package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE/upsert over immutable columnar storage. Parquet has no ACID
  * MERGE INTO; the relational restatement is the standard one every
  * lakehouse table format (Delta/Iceberg/Hudi) compiles MERGE down to:
  * keep the target rows whose key the source does not touch (LEFT ANTI),
  * then union the source — matched keys are replaced wholesale, new keys
  * are inserted.
  *
  * Scale shape: one shuffle equi-join on the key plus a union — no
  * window, no driver state. The anti join broadcasts when the source
  * (the change set — usually small next to the target) fits, which is
  * the common incremental-refresh case; otherwise it degrades to a
  * sort-merge join, still one shuffle each side.
  */
object Merge {

  /** WHEN MATCHED THEN UPDATE (replace row) / WHEN NOT MATCHED THEN
    * INSERT. Both frames must share a schema; `key` must be unique in
    * `source` (each target key replaced by exactly one row). */
  def upsert(target: DataFrame, source: DataFrame, key: String): DataFrame =
    target.join(source.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(source)

  /** Oracle spelling of [[upsert]] for arbitrary target/source SQL. */
  def upsertSql(targetSql: String, sourceSql: String, key: String,
      cols: String): String =
    s"""SELECT $cols FROM ($targetSql) t
       |WHERE $key NOT IN (SELECT $key FROM ($sourceSql) _)
       |UNION ALL SELECT $cols FROM ($sourceSql) s""".stripMargin

  /** CDC-style snapshot diff: classify every key as `added` (only in
    * `after`), `removed` (only in `before`) or `changed` (present in
    * both with any non-key column differing); unchanged keys are
    * omitted. Emits the key, the change type, and the full old/new
    * column pairs (`old_*` / `new_*`, null on the missing side).
    *
    * One full-outer shuffle equi-join on the key; the row comparison is
    * a struct equality — no per-column join conditions, no second
    * pass. This is the diff a downstream incremental consumer replays
    * ([[upsert]] of the added+changed rows plus deletes of the removed
    * keys reconstructs `after` from `before` exactly). */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      key: String): DataFrame = {
    val cols = before.columns.filterNot(_ == key).toSeq
    require(after.columns.filterNot(_ == key).toSeq == cols,
      "snapshotDiff requires identical schemas")
    val b = before.select(col(key), struct(cols.map(col): _*).as("_b"))
    val a = after.select(col(key), struct(cols.map(col): _*).as("_a"))
    b.join(a, Seq(key), "full_outer")
      .withColumn("change_type",
        when(col("_b").isNull, "added")
          .when(col("_a").isNull, "removed")
          .when(col("_a") =!= col("_b"), "changed"))
      .where(col("change_type").isNotNull)
      .select(col(key) +: col("change_type") +:
        (cols.map(c => col(s"_b.$c").as(s"old_$c")) ++
          cols.map(c => col(s"_a.$c").as(s"new_$c"))): _*)
  }

  /** Incremental view maintenance for distributive aggregates: combine
    * an existing rollup with the rollup of JUST the new data, without
    * touching the history. For sums/counts the group-wise combine is
    * addition over a full-outer join with zero-coalesced sides — the
    * algebra Spark itself uses between partial and final aggregation,
    * lifted to table granularity. Refreshing a daily 100 TB rollup this
    * way costs O(delta), not O(history); contrast [[upsert]], which
    * REPLACES matched rows and therefore needs fully recomputed source
    * rows. Only sound for distributive/algebraic aggregates (sum,
    * count, min/max via greatest/least) — a mean must be carried as
    * (sum, count) and divided at read time. */
  def combineAdditive(base: DataFrame, delta: DataFrame, key: String,
      measures: Seq[String]): DataFrame = {
    require(measures.nonEmpty, "combineAdditive needs measure columns")
    val b = base.select(col(key) +: measures.map(c => col(c).as(s"_b_$c")): _*)
    val d = delta.select(col(key) +: measures.map(c => col(c).as(s"_d_$c")): _*)
    b.join(d, Seq(key), "full_outer")
      .select(col(key) +: measures.map(c =>
        (coalesce(col(s"_b_$c"), lit(0L)) + coalesce(col(s"_d_$c"), lit(0L)))
          .as(c)): _*)
  }

  /** Oracle spelling of [[combineAdditive]]. */
  def combineAdditiveSql(baseSql: String, deltaSql: String, key: String,
      measures: Seq[String]): String = {
    val sums = measures.map(c =>
      s"COALESCE(b.$c, 0) + COALESCE(d.$c, 0) AS $c").mkString(", ")
    s"""SELECT COALESCE(b.$key, d.$key) AS $key, $sums
       |FROM ($baseSql) b FULL JOIN ($deltaSql) d ON b.$key = d.$key"""
      .stripMargin
  }

  /** Oracle spelling of [[snapshotDiff]]. `cols` are the non-key
    * columns. */
  def snapshotDiffSql(beforeSql: String, afterSql: String, key: String,
      cols: Seq[String]): String = {
    val olds = cols.map(c => s"b.$c AS old_$c").mkString(", ")
    val news = cols.map(c => s"a.$c AS new_$c").mkString(", ")
    val anyDiff = cols.map(c => s"a.$c IS DISTINCT FROM b.$c")
      .mkString(" OR ")
    s"""SELECT COALESCE(b.$key, a.$key) AS $key,
       |  CASE WHEN b.$key IS NULL THEN 'added'
       |       WHEN a.$key IS NULL THEN 'removed'
       |       WHEN $anyDiff THEN 'changed' END AS change_type,
       |  $olds, $news
       |FROM ($beforeSql) b FULL JOIN ($afterSql) a
       |  ON b.$key = a.$key
       |WHERE b.$key IS NULL OR a.$key IS NULL OR ($anyDiff)""".stripMargin
  }

  /** SCD Type-2 dimension build from a change log: collapse the per-key
    * event stream to its attribute CHANGE points and emit effective-dated
    * rows — `(key, attr, eff_from, eff_to, is_current)` with half-open
    * validity (`eff_to` = the next change's timestamp; NULL = current).
    * Consecutive events carrying the same attribute value collapse into
    * one row, so the dimension's cardinality is the number of transitions,
    * not the number of events.
    *
    * Scale shape: everything is per-key windows over ONE hash shuffle on
    * `key` — the change-point `lag`, the filter, and the `lead` for
    * `eff_to` share the same (key, ts, tie) partitioning+ordering, so
    * Catalyst plans a single Exchange+Sort and pipelines both windows
    * (asserted in MergeSpec). `tie` makes same-timestamp events ordered
    * deterministically (engine- and partitioning-independent), which an
    * SCD build needs or re-runs disagree about who won the day.
    *
    * NULL attribute values are first-class: change detection is
    * null-safe (`IS DISTINCT FROM`), and the first event per key is
    * identified by row position, not by `lag` returning NULL — so a
    * NULL→X transition emits the NULL period and an X→X-with-NULLs log
    * collapses correctly. */
  def scd2(changes: DataFrame, key: String, attr: String, ts: String,
      tie: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(col(ts), col(tie))
    changes.select(col(key), col(attr), col(ts), col(tie))
      .withColumn("_prev", lag(col(attr), 1).over(w))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 || !(col("_prev") <=> col(attr)))
      .withColumn("eff_to", lead(col(ts), 1).over(w))
      .select(col(key), col(attr), col(ts).as("eff_from"), col("eff_to"),
        col("eff_to").isNull.as("is_current"))
  }

  /** Oracle spelling of [[scd2]] (`eff_from`/`eff_to` emitted as-is;
    * callers cast for output parity). */
  def scd2Sql(from: String, key: String, attr: String, ts: String,
      tie: String): String =
    s"""WITH marked AS (
       |  SELECT $key, $attr, $ts, $tie,
       |    LAG($attr) OVER (PARTITION BY $key ORDER BY $ts, $tie) AS prev,
       |    ROW_NUMBER() OVER (PARTITION BY $key ORDER BY $ts, $tie) AS rn
       |  FROM $from),
       |chg AS (
       |  SELECT $key, $attr, $ts, $tie FROM marked
       |  WHERE rn = 1 OR prev IS DISTINCT FROM $attr)
       |SELECT $key, $attr, $ts AS eff_from,
       |  LEAD($ts) OVER (PARTITION BY $key ORDER BY $ts, $tie) AS eff_to,
       |  LEAD($ts) OVER (PARTITION BY $key ORDER BY $ts, $tie) IS NULL
       |    AS is_current
       |FROM chg""".stripMargin
}
