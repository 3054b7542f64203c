package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{caseInsensitiveResolution, caseSensitiveResolution}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Top-k rows per key as a FIRST-CLASS physical operator — the
  * partial-aggregation idea applied to ranking.
  *
  * The built-in spelling (`row_number() OVER (PARTITION BY key ORDER BY
  * ord) <= k`, q18) shuffles EVERY row to its key's reducer and sorts
  * the whole partition, then discards all but k — at 100 TB that is a
  * full-data exchange and an O(n log n) sort for an O(k·keys) answer.
  * This operator plans like an aggregation instead: a map-side pass
  * keeps a bounded k-element heap per key (O(n log k), no sort), the
  * exchange then carries AT MOST k rows per key per input partition,
  * and a final pass re-heaps within each key's reducer. Semantics are
  * exactly `row_number <= k` when `order` is a total order (callers
  * append tiebreak columns, same as they must for a deterministic
  * window top-N).
  *
  * Memory is bounded in BOTH phases — the property `HashAggregateExec`
  * gets from its sort-based fallback:
  *
  *  - The partial phase's key→heap map flushes to output whenever it
  *    exceeds `spark.graft.topk.partialMaxKeys` keys or (approximately,
  *    via `UnsafeRow.getSizeInBytes`) `spark.graft.topk.partialMaxBytes`
  *    bytes, then refills. A flushed key can emit again for later rows —
  *    more than k rows per key may cross the exchange under pressure —
  *    which the final phase tolerates by construction.
  *  - The final phase REQUIRES a within-partition sort on the keys (the
  *    planner's `SortExec` over the already k-bounded exchange output,
  *    external and spillable), then streams one key group at a time
  *    through a single k-element heap: O(k) state, independent of key
  *    cardinality.
  *
  * Float/double keys are canonicalized (`NormalizeFloatingNumbers`:
  * -0.0 → 0.0, one NaN bit pattern) at plan construction, so byte-wise
  * grouping matches the SQL value equality the window spelling uses.
  *
  * Wiring: [[TopKPerKey]] (resolved logical node) → planner strategy
  * ([[TopKPerKeyStrategy]], injected by [[graft.GraftExtensions]]) →
  * partial + final [[TopKPerKeyExec]]; `EnsureRequirements` inserts the
  * hash exchange and the final node's key sort from the declared
  * required distribution/ordering, exactly as for two-phase aggregates.
  */
case class TopKPerKey(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {

  /** Partial-phase flush threshold: distinct keys held per task. */
  val PartialMaxKeysConf = "spark.graft.topk.partialMaxKeys"

  /** Partial-phase flush threshold: approximate retained row bytes. */
  val PartialMaxBytesConf = "spark.graft.topk.partialMaxBytes"

  /** One rank column: name + direction (true = ascending). */
  type OrderSpec = (String, Boolean)

  /** DataFrame API: rows ranking in the first `k` of their key group
    * under `order` (append tiebreaks to make it total; computed rank
    * expressions should be projected to named columns first). Output
    * order is unspecified, like any Spark transform — sort afterwards
    * if needed. Column names resolve with the session's case
    * sensitivity (`spark.sql.caseSensitive`, default insensitive).
    *
    * Keys and order bind to RESOLVED attributes of the analyzed child —
    * Spark 4's Column wrappers carry non-serializable internal nodes
    * that must never reach a task closure. */
  def topK(df: DataFrame, k: Int, keyCols: Seq[String],
      order: Seq[OrderSpec]): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val analyzed = df.queryExecution.analyzed
    val resolver =
      if (df.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean)
        caseSensitiveResolution
      else caseInsensitiveResolution
    def attr(name: String): Attribute =
      analyzed.output.filter(a => resolver(a.name, name)) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"no column '$name' in ${analyzed.output.map(_.name).mkString(",")}")
        case many => throw new IllegalArgumentException(
          s"ambiguous column '$name': ${many.map(_.name).mkString(",")}")
      }
    val keys = keyCols.map(c => GraftSql.normalizeFloats(attr(c)))
    val sortOrder = order.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    GraftSql.ofRows(df.sparkSession,
      TopKPerKey(k, keys, sortOrder, analyzed))
  }
}

/** One phase of the bounded-heap top-k. `partial = true` runs on the map
  * side with no distribution requirement; the final node requires
  * clustering AND a within-partition sort on the keys, which plans the
  * exchange over the already k-bounded partials plus a cheap spillable
  * sort of that bounded output. */
case class TopKPerKeyExec(k: Int, keys: Seq[Expression],
    order: Seq[SortOrder], partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(keys.map(SortOrder(_, Ascending)))

  // Standard custom-exec observability (SQL tab / df.queryExecution
  // metrics): output rows everywhere; on the partial phase also how
  // often the key→heap map hit a memory threshold and flushed — the
  // counter that says "raise partialMaxKeys/Bytes or repartition" when
  // it climbs.
  override lazy val metrics: Map[String, SQLMetric] =
    Map("numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows")) ++
      (if (partial)
        Map("numFlushes" -> SQLMetrics.createMetric(sparkContext,
          "partial map flushes (memory threshold)"))
      else Map.empty)

  override protected def doExecute(): RDD[InternalRow] = {
    // Conf reads happen here on the driver; only the values ship.
    val maxKeys =
      conf.getConfString(TopKPerKey.PartialMaxKeysConf, (1 << 20).toString).toInt
    val maxBytes =
      conf.getConfString(TopKPerKey.PartialMaxBytesConf, (64L << 20).toString).toLong
    require(maxKeys > 0 && maxBytes > 0,
      s"${TopKPerKey.PartialMaxKeysConf}/${TopKPerKey.PartialMaxBytesConf} must be > 0")
    val isPartial = partial
    val outRows = longMetric("numOutputRows")
    val flushes = if (partial) longMetric("numFlushes") else null
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keys, child.output)
      // Children normally emit UnsafeRow, but e.g. row-based scans and
      // custom nodes may not — convert instead of class-cast-crashing.
      val toUnsafe = UnsafeProjection.create(child.output, child.output)
      val ord = RowOrdering.create(order, child.output)
      // Max-heap under the rank order: head = current worst of the
      // kept k, evicted when a better row arrives.
      val heapOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => ord.compare(a, b)
      val rows = iter.map {
        case u: UnsafeRow => u
        case other => toUnsafe(other)
      }
      val out =
        if (isPartial) partialIter(rows, keyProj, ord, heapOrd, maxKeys,
          maxBytes, flushes)
        else finalIter(rows, keyProj, ord, heapOrd)
      out.map { r => outRows += 1; r }
    }
  }

  /** Push one row into a k-bounded heap; returns the byte delta of
    * retained state. Both the row and the projected key are reused
    * buffers — anything kept is copied. */
  private def push(h: mutable.PriorityQueue[UnsafeRow], row: UnsafeRow,
      ord: Ordering[InternalRow]): Long =
    if (h.size < k) {
      val c = row.copy(); h.enqueue(c); c.getSizeInBytes.toLong
    } else if (ord.compare(row, h.head) < 0) {
      val evicted = h.dequeue()
      val c = row.copy(); h.enqueue(c)
      c.getSizeInBytes.toLong - evicted.getSizeInBytes
    } else 0L

  /** Map-side pass: key→heap map, flushed to output (and restarted)
    * whenever it crosses the key-count or approximate-bytes threshold.
    * State is O(min(distinct keys, maxKeys) × k) rows, never the
    * unbounded O(distinct keys × k) of an unflushable map. */
  private def partialIter(iter: Iterator[UnsafeRow], keyProj: UnsafeProjection,
      ord: Ordering[InternalRow], heapOrd: Ordering[UnsafeRow],
      maxKeys: Int, maxBytes: Long, flushes: SQLMetric): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private val heaps =
        mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      private var bytes = 0L
      private var out: Iterator[InternalRow] = Iterator.empty

      private def drain(): Iterator[InternalRow] = {
        // Snapshot before clear — the map's value iterator is lazy.
        val snapshot = heaps.values.toArray
        heaps.clear(); bytes = 0L
        snapshot.iterator.flatMap(_.iterator)
      }

      private def fill(): Unit = {
        while (!out.hasNext && iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          heaps.get(key) match {
            case Some(h) => bytes += push(h, row, ord)
            case None =>
              val h = mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
              val kc = key.copy()
              bytes += push(h, row, ord) + kc.getSizeInBytes
              heaps.put(kc, h)
          }
          if (heaps.size > maxKeys || bytes > maxBytes) {
            flushes += 1
            out = drain()
          }
        }
        if (!out.hasNext && !iter.hasNext && heaps.nonEmpty) out = drain()
      }

      override def hasNext: Boolean = { fill(); out.hasNext }
      override def next(): InternalRow = { fill(); out.next() }
    }

  /** Reduce-side pass over key-clustered, key-sorted input: one key
    * group at a time through a single k-element heap — O(k) state
    * regardless of key cardinality. Group boundaries are byte-equality
    * of the projected (float-normalized) key. */
  private def finalIter(iter: Iterator[UnsafeRow], keyProj: UnsafeProjection,
      ord: Ordering[InternalRow], heapOrd: Ordering[UnsafeRow]): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private var curKey: UnsafeRow = null
      private val heap = mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
      private var out: Iterator[InternalRow] = Iterator.empty

      private def emit(): Iterator[InternalRow] = {
        val snapshot = heap.toArray
        heap.clear()
        snapshot.iterator
      }

      private def fill(): Unit = {
        while (!out.hasNext && iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          if (curKey == null) curKey = key.copy()
          else if (key != curKey) { // UnsafeRow.equals is byte equality
            out = emit()
            curKey = key.copy()
          }
          push(heap, row, ord)
        }
        if (!out.hasNext && !iter.hasNext && heap.nonEmpty) out = emit()
      }

      override def hasNext: Boolean = { fill(); out.hasNext }
      override def next(): InternalRow = { fill(); out.next() }
    }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"
}

/** Plans the logical [[TopKPerKey]] as partial + final
  * [[TopKPerKeyExec]] (the exchange and the final phase's key sort come
  * from `EnsureRequirements`). */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, partial = false,
        TopKPerKeyExec(k, keys, order, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
