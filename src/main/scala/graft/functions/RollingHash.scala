package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: 64-bit polynomial rolling hash over Unicode
  * codepoints, `h = h * 31 + cp` with wrapping 64-bit arithmetic (the full
  * 2^64 space — collision-safe for exact-dedup grouping at 100 TB document
  * counts, unlike a 32/31-bit modulus). Codepoints, not UTF-8 bytes, keep
  * the value encoding-stable and let the DuckDB oracle reproduce it:
  * `list_reduce` over `unicode(substr(...))` in HUGEINT, mod 2^64, then
  * re-signed (see OracleLlm.fingerprint64Sql).
  *
  * A native Catalyst `Expression` with `doGenCode` (not a UDF) so it stays
  * inside whole-stage codegen on the hot path — the preference order the
  * engine follows everywhere (built-in > native Expression > UDF). Used by
  * X-TEXT fingerprinting and as the cheap pre-key for exact dedup at scale
  * (group by 8-byte hash instead of shuffling full document text).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_hash requires a string column, got ${other.sql}")
    }
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  def compute(s: UTF8String): Long = {
    val cp = PolyHashing.codePoints(s)
    var h = 0L
    var i = 0
    while (i < cp.length) {
      h = (h * 31) + cp(i) // wrapping on purpose
      i += 1
    }
    h
  }

  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
}
