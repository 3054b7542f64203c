package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

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
  * Wiring: [[TopKPerKey]] (resolved logical node) → planner strategy
  * ([[TopKPerKeyStrategy]], injected by [[graft.GraftExtensions]]) →
  * partial + final [[TopKPerKeyExec]]; `EnsureRequirements` inserts the
  * hash exchange between them from the final node's required
  * distribution, exactly as it does for two-phase aggregates.
  */
case class TopKPerKey(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {

  /** One rank column: name + direction (true = ascending). */
  type OrderSpec = (String, Boolean)

  /** DataFrame API: rows ranking in the first `k` of their key group
    * under `order` (append tiebreaks to make it total; computed rank
    * expressions should be projected to named columns first). Output
    * order is unspecified, like any Spark transform — sort afterwards
    * if needed.
    *
    * Keys and order bind to RESOLVED attributes of the analyzed child —
    * Spark 4's Column wrappers carry non-serializable internal nodes
    * that must never reach a task closure. */
  def topK(df: DataFrame, k: Int, keyCols: Seq[String],
      order: Seq[OrderSpec]): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$name' in ${analyzed.output.map(_.name).mkString(",")}"))
    val keys = keyCols.map(attr)
    val sortOrder = order.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    GraftSql.ofRows(df.sparkSession,
      TopKPerKey(k, keys, sortOrder, analyzed))
  }
}

/** One phase of the bounded-heap top-k. `partial = true` runs on the map
  * side with no distribution requirement; the final node requires
  * clustering on the keys, which plans the exchange over the already
  * k-bounded partials. */
case class TopKPerKeyExec(k: Int, keys: Seq[Expression],
    order: Seq[SortOrder], partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keys, child.output)
      val ord = RowOrdering.create(order, child.output)
      // Max-heap under the rank order: head = current worst of the
      // kept k, evicted when a better row arrives.
      val heapOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => ord.compare(a, b)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { r =>
        val row = r.asInstanceOf[UnsafeRow]
        // Both the projected key and the input row are reused buffers —
        // copy anything that outlives this iteration.
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < k) h.enqueue(row.copy())
            else if (ord.compare(row, h.head) < 0) {
              h.dequeue(); h.enqueue(row.copy())
            }
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
            h.enqueue(row.copy())
            heaps.put(key.copy(), h)
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"
}

/** Plans the logical [[TopKPerKey]] as partial + final
  * [[TopKPerKeyExec]] (the exchange comes from `EnsureRequirements`). */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, partial = false,
        TopKPerKeyExec(k, keys, order, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
