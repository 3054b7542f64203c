package graft.operators

import org.apache.spark.sql.DataFrame

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
}
