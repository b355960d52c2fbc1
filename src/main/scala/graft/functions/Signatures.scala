package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native signature kernels for X-DEDUP (SURVEY.md §2.8's "graduate to a
  * codegen'd Expression only if benchmarks demand" path — benchmarks
  * demanded: the higher-order-function formulations allocate one array per
  * permutation per row and ran 10-20× slower at sf0.1).
  *
  * Both expressions generate a call to a static kernel from inside
  * whole-stage codegen: one tight primitive loop per row, zero
  * intermediate allocations. All arithmetic lives in the
  * [[PolyHashing.Mod]] = 2^31-1 domain so the DuckDB oracle reproduces
  * signatures exactly (see PolyHash.scala's header for why).
  */

/** MinHash signature: input array<long> of shingle hashes → array<long>
  * of [[MinHashSig.NumHashes]] slot minima of (a_i*h + b_i) mod 2^31-1.
  * With a_i, b_i < 2^31 and h < 2^31, a_i*h + b_i < 2^62 — no overflow in
  * either engine. The coefficient arrays are inlined into the oracle SQL
  * as list literals (graft.OracleLlm), so the oracle computes the same
  * permutations.
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

  /** Permutation modulus = the poly-hash domain (2^31-1, prime). */
  val Prime: Long = PolyHashing.Mod

  /** Fixed pseudo-random permutation coefficients: a_i ∈ [1, P-1],
    * b_i ∈ [0, P-1]. Deterministic seed; the exact values are embedded in
    * the oracle SQL, so changing the seed means regenerating both sides
    * together (they live in the same repo — OracleLlm interpolates these
    * arrays).
    */
  val (aCoef, bCoef): (Array[Long], Array[Long]) = {
    val r = new java.util.Random(42)
    val a = Array.fill(NumHashes)(math.abs(r.nextLong()) % (Prime - 1) + 1)
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

/** SimHash: input array<string> of tokens → [[SimHash.Bits]]-bit (60-bit)
  * fingerprint in a long. Per token, two independent poly hashes (bases
  * 131 and 137) supply 30 bits each; each fingerprint bit is the sign of
  * the ±1 vote sum across tokens. 60 bits (not 64) keeps every
  * intermediate — including the 2^d packing — positive in a signed i64,
  * which both Spark and the DuckDB oracle shift/mask identically (no
  * sign-bit/arithmetic-shift ambiguity).
  */
case class SimHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash requires array<string> tokens, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {
  val Bits = 60
  val BaseLo = 131L
  val BaseHi = 137L

  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](Bits)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      val t = tokens.getUTF8String(j)
      if (t != null) {
        val cp = PolyHashing.codePoints(t)
        var h1 = 0L
        var h2 = 0L
        var c = 0
        while (c < cp.length) {
          h1 = (h1 * BaseLo + cp(c)) % PolyHashing.Mod
          h2 = (h2 * BaseHi + cp(c)) % PolyHashing.Mod
          c += 1
        }
        var i = 0
        while (i < 30) {
          if (((h1 >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
        while (i < Bits) {
          if (((h2 >>> (i - 30)) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < Bits) {
      if (counts(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  def simhash(c: Column): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(c)))
}
