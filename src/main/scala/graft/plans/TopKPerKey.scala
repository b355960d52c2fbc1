package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.LongType

/** Whole-operator custom plan: per-key top-k with bounded partial heaps —
  * the category-(c) extension path (custom LogicalPlan + SparkStrategy +
  * SparkPlan registered via `experimental.extraStrategies`).
  *
  * Semantics: for each distinct key, keep the first `k` rows under the
  * given total order and append their 1-based `rank` — exactly
  * `row_number() OVER (PARTITION BY keys ORDER BY order) <= k`, but the
  * physical plan is two bounded-heap passes:
  *
  *   Partial (per input partition, no shuffle): heap of ≤ k rows per key
  *   → Exchange hashpartitioning(keys): moves ≤ k·partitions rows per key
  *   → Final (per key): merge heaps, emit rows with rank
  *
  * vs the window formulation, which shuffles EVERY row and fully sorts
  * each partition. At 100 TB with k=10, the shuffle carries k rows per
  * key per map task instead of the whole table — the same partial/final
  * shape Spark uses for aggregates, applied to top-k selection.
  *
  * The ordering must be total (add a unique tiebreak column) for
  * deterministic results — same requirement the oracle SQL has.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      keys.flatMap(_.references) ++ order.flatMap(_.references))
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rankAttr, child) =>
      TopKPerKeyExec(keys, order, k, partial = false, rankAttr,
        TopKPerKeyExec(keys, order, k, partial = true, rankAttr, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    rankAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def requiredChildDistribution: Seq[physical.Distribution] =
    if (partial) Seq(physical.UnspecifiedDistribution)
    else Seq(physical.ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val isPartial = partial
    val outAttrs = output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      implicit val rowOrd: Ordering[InternalRow] =
        GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap by sort order: head = worst kept row, evicted first
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow]
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      if (isPartial) {
        heaps.valuesIterator.flatMap(_.iterator)
      } else {
        val outProj = UnsafeProjection.create(outAttrs, childOutput :+ rankAttr)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        val rankIsInt = rankAttr.dataType == org.apache.spark.sql.types.IntegerType
        heaps.valuesIterator.flatMap { heap =>
          val sorted: Seq[InternalRow] = heap.dequeueAll.reverse
          sorted.iterator.zipWithIndex.map { case (row, i) =>
            if (rankIsInt) rankRow.update(0, i + 1)
            else rankRow.update(0, (i + 1).toLong)
            outProj(joined(row, rankRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {

  /** Per-key top-k with appended `rank` column. `order` is
    * (columnName, descending) pairs and must form a total order (include
    * a unique tiebreak). Columns are resolved by name against the child's
    * analyzed output — the node is built fully resolved (Column objects
    * can't be used here: their lazy ColumnNode wrappers are unresolved
    * and not task-serializable). Registers the planner strategy on first
    * use (idempotent, public `experimental` API).
    */
  def apply(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(a => df.sparkSession.sessionState.conf.resolver(a.name, name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val sortOrders = order.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) org.apache.spark.sql.catalyst.expressions.Descending else Ascending)
    }
    val rankAttr = AttributeReference("rank", LongType, nullable = false)()
    ColumnBridge.ofRows(spark,
      TopKPerKeyNode(keys.map(attr), sortOrders, k, rankAttr, analyzed))
  }
}
