package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's native expressions, so
  * `spark.sql("SELECT rolling_hash(text) ...")` works alongside the
  * Column API.
  *
  * Two registration paths:
  *  - [[GraftExtensions]] — `SparkSessionExtensions.injectFunction`, for
  *    sessions built with `.withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.functions.GraftExtensions`;
  *  - [[GraftFunctions.register]] — direct FunctionRegistry registration
  *    into an already-running session (the driver harness builds its own
  *    session, so extensions can't be injected at build time there).
  */
object GraftFunctions {

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("rolling_hash",
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (es: Seq[Expression]) => RollingHash(es.head)),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (es: Seq[Expression]) => MinHashSig(es.head)),
    ("simhash",
      new ExpressionInfo(classOf[SimHash].getName, "simhash"),
      (es: Seq[Expression]) => SimHash(es.head)),
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("sq_dist",
      new ExpressionInfo(classOf[SqDist].getName, "sq_dist"),
      (es: Seq[Expression]) => SqDist(es(0), es(1))))

  /** Register into a live session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

/** `spark.sql.extensions`-compatible injection point: SQL functions, the
  * windowed-top-k optimizer rewrite, and its planner strategy.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
