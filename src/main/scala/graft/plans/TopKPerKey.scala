package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Native per-key top-k — the whole-operator Catalyst extension
  * (logical node → planner strategy → physical exec, injected via
  * GraftExtensions). Spark 4's own rank-window idiom already bounds
  * the shuffle with WindowGroupLimit (a partial group-limit below
  * the exchange), but that partial SORTS every input partition
  * first — O(n log n) per partition plus sort-buffer/spill pressure
  * on skewed partitions — and the final phase sorts again to run
  * the Window. This operator runs like partial aggregation instead:
  * a map-side pass keeps at most k rows per key per partition in a
  * bounded HEAP — O(n log k), constant memory per key, no sort, no
  * spill — the exchange moves only those survivors (≤ k·partitions
  * rows per key), and a reduce-side heap pass merges to the exact
  * per-key top k with no rank column materialized when only the
  * rows are wanted.
  *
  * Semantics: the k FIRST rows of each key group under `order`
  * (total order required for determinism — callers append a unique
  * tiebreaker, as with any rank window). Output rows are the
  * survivors verbatim, in no guaranteed order.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
  : TopKPerKeyPlan = copy(child = newChild)
}

/** Planner rule: partial (any distribution) under final (clustered
  * by the keys) — EnsureRequirements inserts the hash exchange
  * between them, exactly as it does for two-phase aggregation.
  */
class TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      val partial =
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val ordExprs = order
    val attrs = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, attrs)
      val ord = RowOrdering.create(ordExprs, attrs)
      // per-key max-heap of the kept rows: head = worst survivor, so
      // a better row evicts it in O(log k)
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          -ord.compare(a, b)
      }
      val heaps =
        new java.util.HashMap[UnsafeRow,
          java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row) // reused buffer — copy only on insert
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[InternalRow](kLocal, worstFirst)
          heaps.put(key.copy(), q)
        }
        if (q.size() < kLocal) q.add(row.copy())
        else if (ord.compare(row, q.peek()) < 0) {
          q.poll(); q.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
  : TopKPerKeyExec = copy(child = newChild)
}
