package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine-reproducible polynomial hashing over Unicode codepoints.
  *
  * Every signature in the dedup/similarity family (MinHash shingles,
  * SimHash token bits, document fingerprints) is built from
  * `h = (h*base + codepoint) mod 2^31-1` folds. The point of this choice
  * over xxhash64 is that the *entire* computation is expressible in
  * portable ANSI SQL (`list_reduce` over `unicode(substr(...))`), so the
  * DuckDB oracle reproduces signatures, candidate pairs, and similarity
  * estimates bit-for-bit — the correctness gate covers the whole
  * signature family instead of rows-only checks. All intermediates stay
  * below 2^62 (no overflow in either engine's 64-bit integers), and
  * codepoints — not UTF-8 bytes — make the values encoding-stable.
  *
  * Native codegen'd kernels (static `compute` calls inside whole-stage
  * codegen), same shape as [[MinHashSig]]: one tight loop per row, no
  * per-row allocations beyond the output.
  */
object PolyHashing {
  /** 2^31-1 (Mersenne prime): hash domain for all poly hashes. */
  val Mod: Long = 2147483647L

  /** Decode a UTF8String to codepoints (manual UTF-8 walk — no
    * java.lang.String allocation on the hot path).
    */
  def codePoints(s: UTF8String): Array[Int] = {
    val bytes = s.getBytes
    val out = new Array[Int](s.numChars())
    var i = 0
    var n = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xff
      if (b0 < 0x80) { out(n) = b0; i += 1 }
      else if (b0 < 0xe0) {
        out(n) = ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f); i += 2
      } else if (b0 < 0xf0) {
        out(n) = ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
        i += 3
      } else {
        out(n) = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
        i += 4
      }
      n += 1
    }
    out
  }

  /** (((0*b + cp0)*b + cp1)...) mod 2^31-1 over the whole string. */
  def polyHash(s: UTF8String, base: Long): Long = {
    val cp = codePoints(s)
    var h = 0L
    var i = 0
    while (i < cp.length) {
      h = (h * base + cp(i)) % Mod
      i += 1
    }
    h
  }
}

/** `poly_hash(str, base)`: the 31-bit polynomial codepoint hash as a
  * column expression.
  */
case class PolyHash(child: Expression, base: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.NullType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a string column, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    PolyHashing.polyHash(input.asInstanceOf[UTF8String], base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHashing.polyHash($c, ${base}L);")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  def poly_hash(c: Column, base: Long): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c), base))
}

/** `poly_shingles(text, k, base)`: sorted distinct polynomial hashes of
  * all k-codepoint windows — the MinHash shingle set in one pass (the
  * composed `transform(sequence(...), substr→hash)` + `array_distinct`
  * formulation allocates a substring per window per row).
  *
  * Oracle mirror (DuckDB):
  * `list_distinct(list_transform(range(1, length(text)-k+2), i ->
  *    list_reduce(list_prepend(0, list_transform(range(0, k), j ->
  *      unicode(substr(text, i+j, 1)))), (a,b) -> (a*base + b) % 2147483647)))`
  */
case class PolyShingles(child: Expression, k: Int, base: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.NullType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_shingles requires a string column, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    PolyShingles.compute(input.asInstanceOf[UTF8String], k, base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyShingles.compute($c, $k, ${base}L);")

  override protected def withNewChildInternal(newChild: Expression): PolyShingles =
    copy(child = newChild)
}

/** `bin_shingles(bin, k, stride, base)`: sorted distinct polynomial
  * hashes of the k-BYTE windows taken every `stride` bytes of a binary
  * payload — the media-domain sibling of [[PolyShingles]] for
  * X-MM-NEARDUP. Operating on raw bytes (values 0–255) keeps the kernel
  * codec-free: a re-encoded or locally-corrupted copy of a payload
  * still shares most strided windows, which is exactly what the exact
  * digest (md5) key of X-MM-DEDUP cannot see. The stride bounds the
  * shingle set to |payload|/stride per row (a 100 TB media corpus
  * cannot afford a hash per byte offset).
  *
  * Oracle mirror (DuckDB, for payloads that are single-byte-encoded
  * text — the fixture's, by construction):
  * `list_distinct(list_transform(range(1, length(text)-k+2, stride),
  *    wi -> list_reduce(list_prepend(0, list_transform(range(0, k), wj ->
  *      unicode(substr(text, wi+wj, 1)))), (a,b) -> (a*base+b) % 2147483647)))`
  */
case class BinShingles(child: Expression, k: Int, stride: Int, base: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bin_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.NullType |
         org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bin_shingles requires a binary column, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    BinShingles.compute(input.asInstanceOf[Array[Byte]], k, stride, base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BinShingles.compute($c, $k, $stride, ${base}L);")

  override protected def withNewChildInternal(newChild: Expression): BinShingles =
    copy(child = newChild)
}

object BinShingles {
  def compute(bytes: Array[Byte], k: Int, stride: Int, base: Long): ArrayData = {
    val n = if (bytes.length < k) 0 else (bytes.length - k) / stride + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0L
      var j = 0
      val off = i * stride
      while (j < k) { h = (h * base + (bytes(off + j) & 0xff)) % PolyHashing.Mod; j += 1 }
      hs(i) = h
      i += 1
    }
    java.util.Arrays.sort(hs)
    var m = 0
    var t = 0
    while (t < n) {
      if (t == 0 || hs(t) != hs(t - 1)) { hs(m) = hs(t); m += 1 }
      t += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, m))
  }

  def bin_shingles(c: Column, k: Int, stride: Int, base: Long = 131L): Column =
    ColumnBridge.column(BinShingles(ColumnBridge.expression(c), k, stride, base))
}

object PolyShingles {
  def compute(s: UTF8String, k: Int, base: Long): ArrayData = {
    val cp = PolyHashing.codePoints(s)
    val n = cp.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * base + cp(i + j)) % PolyHashing.Mod; j += 1 }
      hs(i) = h
      i += 1
    }
    // sorted distinct (order is irrelevant downstream: only min() consumes)
    java.util.Arrays.sort(hs)
    var m = 0
    var t = 0
    while (t < n) {
      if (t == 0 || hs(t) != hs(t - 1)) { hs(m) = hs(t); m += 1 }
      t += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, m))
  }

  def poly_shingles(c: Column, k: Int, base: Long = 131L): Column =
    ColumnBridge.column(PolyShingles(ColumnBridge.expression(c), k, base))
}
