package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-group top-k as a first-class operator — logical node, planner
  * strategy, and a two-phase physical implementation.
  *
  * The DataFrame-level idiom (`row_number().over(Window.partitionBy(g)
  * .orderBy(o)) <= k`) plans as exchange → full SORT of every group →
  * rank → filter: it materializes and sorts ALL rows to keep k. This
  * operator keeps a bounded heap of k rows per group instead:
  *
  *   partial (map side, no distribution requirement): each input
  *     partition is pruned to ≤ k rows per group BEFORE the exchange —
  *     shuffle volume drops from |rows| to ≤ k·|groups per partition|,
  *     the same shape partial aggregation gives groupBy;
  *   final (after clustering on the group keys): re-prune and emit each
  *     group's rows in sort order with a 1-based `rank` column.
  *
  * Heap memory is O(k · distinct groups per partition) — bounded like a
  * hash aggregate, never O(rows). No full sort happens at any point;
  * per-group cost is O(n·log k) insertion + O(k·log k) final ordering.
  */
case class TopKPerGroup(groupExprs: Seq[Expression], order: Seq[SortOrder],
                        k: Int, rankAttr: Attribute, child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, "top-k needs k > 0")
  require(groupExprs.nonEmpty,
    "per-group top-k needs group keys (global top-k is ORDER BY + LIMIT)")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rank is produced here, not consumed from the child (without this,
  // missingInput sees it in `references` and analysis fails)
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

/** Shared bounded per-group heap pruning over one partition's rows. */
private[plans] object TopKHeaps {
  /** Map of group key → bounded heap (largest-by-`ord` at the head, so
    * exceeding k evicts the worst row and keeps the k first rows in
    * `ord`'s ascending order). Rows are copied: Spark reuses the
    * iterator's UnsafeRow backing buffer. */
  def prune(iter: Iterator[InternalRow], groupExprs: Seq[Expression],
            order: Seq[SortOrder], k: Int, inputAttrs: Seq[Attribute]):
      java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]] = {
    val keyProj = UnsafeProjection.create(groupExprs, inputAttrs)
    val ord = GenerateOrdering.generate(order, inputAttrs)
    val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    iter.foreach { row =>
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        // initial capacity capped: k can be large relative to the actual
        // group size, and PriorityQueue allocates its slot array eagerly
        heap = new java.util.PriorityQueue[InternalRow](
          math.min(k + 1, 64), ord.reverse)
        heaps.put(key.copy(), heap)
      }
      heap.offer(row.copy())
      if (heap.size() > k) heap.poll()
    }
    heaps
  }
}

/** Map-side phase: prune each partition to ≤ k rows per group. Output
  * schema is unchanged; ordering within a group is unspecified. */
case class TopKPerGroupPartialExec(groupExprs: Seq[Expression],
                                   order: Seq[SortOrder], k: Int,
                                   child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, attrs) = (groupExprs, order, k, child.output)
    child.execute().mapPartitions { iter =>
      val heaps = TopKHeaps.prune(iter, g, o, kk, attrs)
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.forEach((_, heap) => heap.forEach(r => out += r))
      out.iterator
    }
  }
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Reduce-side phase: requires clustering on the group keys (the planner
  * inserts the exchange), re-prunes, and emits each group's k rows in
  * sort order with a 1-based dense `rank`. */
case class TopKPerGroupFinalExec(groupExprs: Seq[Expression],
                                 order: Seq[SortOrder], k: Int,
                                 rankAttr: Attribute,
                                 child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, attrs, outAttrs) = (groupExprs, order, k, child.output, output)
    child.execute().mapPartitions { iter =>
      val heaps = TopKHeaps.prune(iter, g, o, kk, attrs)
      val ord = GenerateOrdering.generate(o, attrs)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.forEach { (_, heap) =>
        val rows = new java.util.ArrayList[InternalRow](heap)
        rows.sort(ord)
        var r = 0
        while (r < rows.size()) {
          rankRow.update(0, (r + 1).toLong)
          out += outProj(joined(rows.get(r), rankRow)).copy()
          r += 1
        }
      }
      out.iterator
    }
  }
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Plans [[TopKPerGroup]] as partial → (exchange) → final. Registered
  * per-session via `spark.experimental.extraStrategies` (done lazily by
  * [[graft.engine.Ranking.topKPerGroup]]) or globally via
  * [[graft.GraftExtensions]]. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, rank, child) =>
      TopKPerGroupFinalExec(g, o, k, rank,
        TopKPerGroupPartialExec(g, o, k, planLater(child))) :: Nil
    case _ => Nil
  }
}
