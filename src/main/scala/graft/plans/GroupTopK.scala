package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BaseOrdering, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k as a first-class Catalyst operator (logical node +
  * planner strategy + two-phase physical exec).
  *
  * The standard DataFrame formulation — row_number() over a window,
  * then `rn <= k` — shuffles EVERY row to its group's reducer and
  * sorts full groups before the filter throws almost all of it away.
  * This operator keeps a bounded k-row heap per group inside each map
  * partition, so only `k · groups` survivor rows per partition reach
  * the shuffle, and the final pass merges heaps per group. At 100 TB
  * with a hot group (every event keyed to one user) the window plan's
  * reducer receives the whole group; this plan's reducer receives
  * `k × partitions` rows — the same partial-vs-total distinction as
  * partial aggregation, applied to rank-filtering.
  *
  * Semantics: the k first rows of each group under `order` (a TOTAL
  * order — add a unique tie-break column for determinism, same
  * contract as any deterministic top-k). Row set is identical to the
  * window+filter plan; no rank column is emitted.
  */
object GroupTopK {

  /** Logical node: per-group top-k preserving the child's schema. */
  case class GroupTopKNode(groupExprs: Seq[Expression], order: Seq[SortOrder],
                           k: Int, child: LogicalPlan) extends UnaryNode {
    require(k > 0, "k must be positive")
    override def output: Seq[Attribute] = child.output
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(c: LogicalPlan): GroupTopKNode =
      copy(child = c)
  }

  /** Plans the logical node as partial (map-side heaps) → exchange on
    * the group keys (inserted by EnsureRequirements) → final merge. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case GroupTopKNode(g, o, k, child) =>
        GroupTopKExec(g, o, k, partial = false,
          GroupTopKExec(g, o, k, partial = true, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** Physical per-partition grouped top-k. `partial = true` imposes no
    * distribution (runs map-side); the final node asks for clustering
    * on the group keys so every group's survivors meet on one reducer. */
  case class GroupTopKExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                           k: Int, partial: Boolean, child: SparkPlan)
      extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) Seq(UnspecifiedDistribution)
      else Seq(ClusteredDistribution(groupExprs))

    /** Partial-side safety valve: if a map partition sees more distinct
      * groups than this, flush the heaps downstream and restart — the
      * result is still exact (the final pass re-reduces), memory stays
      * bounded, and high-cardinality groupings degrade gracefully to
      * the plain shuffle they would have needed anyway. */
    private val maxPartialGroups = 4 << 20

    override protected def doExecute(): RDD[InternalRow] = {
      val groupExprsB = groupExprs
      val orderB = order
      val childOutput = child.output
      val kB = k
      val partialB = partial
      val maxGroups = maxPartialGroups
      child.execute().mapPartitions({ iter =>
        new GroupTopKIterator(iter, groupExprsB, orderB, childOutput, kB,
          if (partialB) maxGroups else Int.MaxValue, sortOutput = !partialB)
      }, preservesPartitioning = true)
    }

    override protected def withNewChildInternal(c: SparkPlan): GroupTopKExec =
      copy(child = c)
  }

  /** Heap-per-group iterator. Emits groups as their heaps are flushed;
    * `sortOutput` (final pass) orders each group's rows by `order` so
    * results are deterministic row streams. */
  private final class GroupTopKIterator(
      input: Iterator[InternalRow], groupExprs: Seq[Expression],
      order: Seq[SortOrder], childOutput: Seq[Attribute], k: Int,
      maxGroups: Int, sortOutput: Boolean) extends Iterator[InternalRow] {

    private val keyProj = UnsafeProjection.create(groupExprs, childOutput)
    private val ord: BaseOrdering = RowOrdering.create(order, childOutput)
    // java PQ is a min-heap; reverse the ordering so peek() is the
    // WORST survivor — the row the next candidate must beat
    private val worstFirst = ord.reversed()

    private var heaps =
      new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    private var flushed: Iterator[InternalRow] = Iterator.empty

    private def insert(row: InternalRow): Unit = {
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](k, worstFirst)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) heap.add(row.copy())
      else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll(); heap.add(row.copy())
      }
    }

    private def drain(): Iterator[InternalRow] = {
      val hs = heaps
      heaps = new java.util.HashMap()
      val it = hs.values().iterator()
      new Iterator[Iterator[InternalRow]] {
        override def hasNext: Boolean = it.hasNext
        override def next(): Iterator[InternalRow] = {
          val heap = it.next()
          if (sortOutput) {
            val arr = heap.toArray(new Array[InternalRow](heap.size))
            java.util.Arrays.sort(arr, ord)
            arr.iterator
          } else {
            import scala.jdk.CollectionConverters._
            heap.iterator().asScala
          }
        }
      }.flatten
    }

    override def hasNext: Boolean = {
      while (!flushed.hasNext && input.hasNext) {
        insert(input.next())
        if (heaps.size >= maxGroups) flushed = drain()
        else if (!input.hasNext) flushed = drain()
      }
      flushed.hasNext
    }

    override def next(): InternalRow = flushed.next()
  }

  // ------------------------------------------------------------- Column API

  /** Top-k rows per group. `order` columns must form a total order for
    * deterministic output (tie-break on a unique key).
    *
    * Resolution is delegated to the real analyzer: the sort columns go
    * through `df.sort` and the group columns through `df.select`, and
    * the resolved expressions are lifted out of the analyzed plans —
    * hand-rolling Column→Expression conversion here would miss the
    * analyzer's resolution rules (and `.desc` columns convert lazily). */
  def topKPerGroup(df: DataFrame, k: Int, groupCols: Seq[Column],
                   orderCols: Seq[Column]): DataFrame = {
    val spark: SparkSession = df.sparkSession
    GraftBridge.addStrategy(spark, Strategy)
    val (order, base) = GraftBridge.analyzed(df.sort(orderCols: _*)) match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => (s.order, s.child)
      case other => throw new IllegalStateException(s"expected Sort, got $other")
    }
    val groupExprs = GraftBridge.analyzed(df.select(groupCols: _*)) match {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.map {
          case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
          case e => e
        }
      case other => throw new IllegalStateException(s"expected Project, got $other")
    }
    GraftBridge.dataFrame(spark, GroupTopKNode(groupExprs, order, k, base))
  }
}
