package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, CreateArray, Expression, GetArrayItem, If, IsNull, Least,
  Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mergeable MinHash signature union as a custom `DeclarativeAggregate`:
  * the group signature is the elementwise minimum of member signatures —
  * by the MinHash property, the signature of a UNION of shingle sets.
  *
  * The aggregation buffer is [[MinHashSig.NumHashes]] *fixed-width long
  * slots*, not one ArrayType column: an array buffer is not
  * UnsafeRow-mutable, so HashAggregateExec would reject it and the plan
  * would silently fall back to SortAggregate. With primitive slots the
  * update/merge expressions (`least` per slot) stay inside codegen'd hash
  * aggregation with map-side partial merge — the signature of a 100 TB
  * corpus partition folds locally to 64 longs before any shuffle. This is
  * the "persistable mergeable sketch" path SURVEY.md §2.8 reserved for
  * when it's needed: per-source/per-shard signatures can be stored and
  * re-merged incrementally.
  */
case class MinHashMerge(child: Expression) extends DeclarativeAggregate {

  private val n = MinHashSig.NumHashes

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_merge"

  private lazy val slots: Seq[AttributeReference] =
    (0 until n).map(i => AttributeReference(s"s$i", LongType, nullable = false)())
  override lazy val aggBufferAttributes: Seq[AttributeReference] = slots

  override lazy val initialValues: Seq[Expression] =
    Seq.fill(n)(Literal(Long.MaxValue))

  override lazy val updateExpressions: Seq[Expression] =
    (0 until n).map(i =>
      If(IsNull(child), slots(i), Least(Seq(slots(i), GetArrayItem(child, Literal(i))))))

  override lazy val mergeExpressions: Seq[Expression] =
    (0 until n).map(i => Least(Seq(slots(i).left, slots(i).right)))

  override lazy val evaluateExpression: Expression = CreateArray(slots)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashMerge =
    copy(child = newChildren.head)
}

object MinHashMerge {
  def minhash_merge(c: Column): Column =
    ColumnBridge.column(MinHashMerge(ColumnBridge.expression(c)).toAggregateExpression())
}
