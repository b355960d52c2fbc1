package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, Expression, If, IsNull, LambdaFunction, Least, Literal,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mergeable MinHash signature union as a custom `DeclarativeAggregate`:
  * the group signature is the elementwise minimum of member signatures —
  * by the MinHash property, the signature of a UNION of shingle sets.
  *
  * Declarative (pure expressions: `zip_with(least)`), so update and merge
  * stay inside codegen'd hash aggregation with map-side partial merge —
  * the signature of a 100 TB corpus partition folds locally to 64 longs
  * before any shuffle. This is the "persistable mergeable sketch" path
  * SURVEY.md §2.8 reserved for when it's needed: per-source/per-shard
  * signatures can be stored and re-merged incrementally.
  */
case class MinHashMerge(child: Expression) extends DeclarativeAggregate {

  private val n = MinHashSig.NumHashes

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_merge"

  private lazy val sig = AttributeReference("sig", dataType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = sig :: Nil

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(Seq.fill(n)(Long.MaxValue), dataType))

  private def zipMin(a: Expression, b: Expression): Expression = {
    val x = NamedLambdaVariable("x", LongType, nullable = false)
    val y = NamedLambdaVariable("y", LongType, nullable = false)
    ZipWith(a, b, LambdaFunction(Least(Seq(x, y)), Seq(x, y)))
  }

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), sig, zipMin(sig, child)))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    zipMin(sig.left, sig.right))

  override lazy val evaluateExpression: Expression = sig

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashMerge =
    copy(child = newChildren.head)
}

object MinHashMerge {
  def minhash_merge(c: Column): Column =
    ColumnBridge.column(MinHashMerge(ColumnBridge.expression(c)).toAggregateExpression())
}
