package org.apache.spark.sql.graftnative

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Grouped top-k as a first-class operator — the (c)-tier extension point:
  * custom LogicalPlan + SparkStrategy + SparkPlan, registered through
  * GraftExtensions.
  *
  * Semantics: for each distinct key, the first `k` child rows under
  * `sortOrder` (row_number ≤ k — supply a tiebreak for determinism).
  *
  * Why not a window? `row_number().over(partitionBy(key).orderBy(...))`
  * plans as Exchange → SortExec(full sort of EVERY group) → WindowExec,
  * materializing and sorting all n rows per partition. This operator keeps
  * a bounded heap per key: O(n log k) comparisons, O(#keys · k) memory, no
  * sort of the non-surviving rows — the same reason Spark plans global
  * orderBy+limit as TakeOrderedAndProject. At 100 TB, "top 10 routes per
  * city" over billions of rows never buffers more than keys·k rows per
  * task.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(keys.nonEmpty, "TopKPerKey needs at least one key")
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** `partial = true` is the map-side instance: it runs BEFORE the exchange
  * with no distribution requirement and prunes each input partition to its
  * local per-key top-k — correct because a row outside its partition's
  * top-k cannot be in the global top-k. The shuffle then moves at most
  * partitions·keys·k rows instead of everything, the same contract as
  * partial aggregation (worst case, all-distinct keys, it's a no-op pass —
  * same trade Spark's own partial HashAggregate makes).
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Final instance: all rows of one key co-located; Catalyst inserts the
    * hash exchange (or reuses an existing compatible partitioning).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    // normalized keys: the exchange must hash -0.0 and 0.0 (and all NaN
    // bit patterns) to the same partition, like any SQL grouping exchange
    else Seq(ClusteredDistribution(keys.map(
      org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize)))

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  override protected def doExecute(): RDD[InternalRow] = {
    // Normalize float/double keys (-0.0 → 0.0, canonical NaN): grouping is
    // raw UnsafeRow bytes and the exchange hashes those bytes, so without
    // this -0.0 and 0.0 form two groups (and may land on two partitions),
    // diverging from SQL GROUP BY / window semantics. Spark's own
    // NormalizeFloatingNumbers rule only rewrites known node types
    // (Aggregate/Window/Join) — a custom node must do it itself.
    val localKeys = keys.map(
      org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize)
    val localOrder = sortOrder
    val localOutput = output
    val localK = k
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(localKeys, localOutput)
      val ord = GenerateOrdering.generate(localOrder, localOutput)
      // max-heap under the sort order: head = worst surviving row → O(log k)
      // eviction when a better row arrives
      implicit val rowOrd: Ordering[InternalRow] = (a, b) => ord.compare(a, b)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        // copy the key only on first insertion — getOrElseUpdate's eager
        // argument would allocate per row
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow]
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < localK) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy: maps the logical node to the physical operator. */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      // partial (map-side) prune → exchange (inserted by EnsureRequirements
      // between the two) → final per-key top-k
      TopKPerKeyExec(keys, order, k,
        TopKPerKeyExec(keys, order, k, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Top `k` rows per key group under `orderCols` (use `col.desc`/`asc`;
    * bare columns default to ascending). Deterministic only if the order
    * has no ties — add a tiebreak column as with any top-k.
    *
    * Column-to-expression note: Spark 4's Column wraps a lazy ColumnNode
    * that only becomes a catalyst expression during analysis, so the sort
    * columns are resolved by analyzing a throwaway Sort plan and lifting
    * out its (fully resolved, serializable) SortOrder list.
    */
  def apply(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int): DataFrame = {
    val analyzedSort = df.sort(orderCols: _*).queryExecution.analyzed
    val (order, child) = analyzedSort match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => (s.order, s.child)
      case other => throw new IllegalStateException(
        s"expected a Sort plan from df.sort, got ${other.nodeName}")
    }
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    val keys = keyCols.map { n =>
      child.output.find(a => resolver(a.name, n)).getOrElse(
        throw new IllegalArgumentException(
          s"key column $n not found in ${child.output.map(_.name).mkString(", ")}"))
    }
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    org.apache.spark.sql.classic.Dataset.ofRows(spark,
      TopKPerKeyNode(keys, order, k, child))
  }
}
