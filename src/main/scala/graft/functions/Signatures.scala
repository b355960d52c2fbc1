package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native signature kernels for X-DEDUP (SURVEY.md §2.8's "graduate to a
  * codegen'd Expression only if benchmarks demand" path — benchmarks
  * demanded: the higher-order-function formulations allocate one array per
  * permutation per row and ran 10-20× slower at sf0.1).
  *
  * Both expressions generate a call to a static kernel from inside
  * whole-stage codegen: one tight primitive loop per row, zero
  * intermediate allocations.
  */

/** MinHash signature: input array<long> of shingle hashes → array<long>
  * of [[MinHashSig.NumHashes]] slot minima of (a_i*h + b_i) mod P.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires array<bigint> shingle hashes, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val NumHashes = 64
  /** Hash domain [0, 2^32); prime just above it; a < 2^28 keeps a*h+b
    * within a positive long (ANSI-safe by construction).
    */
  val Prime: Long = 4294967311L

  val (aCoef, bCoef): (Array[Long], Array[Long]) = {
    val r = new java.util.Random(42)
    val a = Array.fill(NumHashes)(math.abs(r.nextLong()) % ((1L << 28) - 1) + 1)
    val b = Array.fill(NumHashes)(math.abs(r.nextLong()) % Prime)
    (a, b)
  }

  def compute(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val sig = new Array[Long](NumHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < NumHashes) {
        val v = (aCoef(i) * h + bCoef(i)) % Prime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  def minhash_sig(c: Column): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c)))
}

/** SimHash: input array<string> of tokens → 64-bit fingerprint. Uses the
  * same xxhash64(seed=42) as Spark's SQL `xxhash64` for each token.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string> tokens, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  val Seed = 42L

  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      val t = tokens.getUTF8String(j)
      if (t != null) {
        val h = XXH64.hashUTF8String(t, Seed)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
}
