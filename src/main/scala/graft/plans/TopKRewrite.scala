package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the canonical windowed top-k pattern
  *
  *   Filter(rn <= k, Window(row_number() OVER (PARTITION BY p ORDER BY o) AS rn, child))
  *
  * into the bounded-heap [[TopKPerKeyNode]] — same semantics, but the
  * physical plan shuffles at most k rows per key per input partition
  * instead of every row (the window plan shuffles the full input and sorts
  * each partition). This is the engine's `Rule[LogicalPlan]` extension
  * point, injected via [[graft.functions.GraftExtensions]] or applied
  * explicitly with [[TopKRewrite.rewrite]].
  *
  * Conservative by design: only fires on a single row_number window
  * expression whose rank attribute is compared to a positive literal, with
  * a non-empty ORDER BY (callers are responsible for total order, exactly
  * as with the window formulation's determinism).
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** rank-bound extraction: rn <= k | rn < k | k >= rn | k > rn. */
  private def bound(cond: Expression): Option[(Attribute, Long)] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)) => Some((a, v.toLong))
    case LessThan(a: Attribute, Literal(v: Int, IntegerType)) => Some((a, v.toLong - 1))
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute) => Some((a, v.toLong))
    case GreaterThan(Literal(v: Int, IntegerType), a: Attribute) => Some((a, v.toLong - 1))
    case _ => None
  }

  private def rewriteFilter(cond: Expression, w: Window): Option[LogicalPlan] =
    (bound(cond), w.windowExpressions) match {
      case (Some((rankRef, k)),
            Seq(al @ Alias(WindowExpression(_: RowNumber, WindowSpecDefinition(part, order, _)), _)))
          if rankRef.exprId == al.exprId && k > 0 && order.nonEmpty && part.nonEmpty =>
        val rankAttr = AttributeReference(al.name, IntegerType, nullable = false)(exprId = al.exprId)
        Some(TopKPerKeyNode(part, order, k.toInt, rankAttr, w.child))
      case _ => None
    }

  /** Descend through pass-through Projects (attribute-only reprojections —
    * the analyzer stacks several between the Filter and the Window) to the
    * Window node; returns the top-down Project chain for rebuilding.
    */
  private def peel(plan: LogicalPlan, acc: List[Project]): Option[(List[Project], Window)] =
    plan match {
      case w: Window => Some((acc.reverse, w))
      case p: Project if p.projectList.forall(_.isInstanceOf[Attribute]) =>
        peel(p.child, p :: acc)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      peel(child, Nil).flatMap { case (projs, w) =>
        rewriteFilter(cond, w).map { topk =>
          // the topk node already bounds ranks, so the Filter is dropped;
          // the pass-through Projects are rebuilt over the new node
          projs.foldRight(topk: LogicalPlan)((p, acc) => p.copy(child = acc))
        }
      }.getOrElse(f)
  }

  /** Apply the rewrite to a DataFrame explicitly (for sessions without the
    * extensions installed, e.g. the driver harness).
    */
  def rewrite(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    org.apache.spark.sql.graftx.ColumnBridge.ofRows(spark, apply(df.queryExecution.analyzed))
  }
}
