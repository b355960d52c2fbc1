package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan, "An Improved Data Stream
  * Summary: The Count-Min Sketch and its Applications", J.Alg. 2005) as a
  * typed Dataset `Aggregator` — the frequency-estimation member of the
  * sketch family (HLL = distincts, SpaceSaving = top-k membership,
  * CMS = per-item counts).
  *
  * Unlike SpaceSaving, the merge is ELEMENT-WISE ADDITION — commutative,
  * associative, no eviction — so the finished sketch is EXACTLY
  * determined by the input multiset, independent of partitioning and
  * merge order. That makes the RAW estimates oracle-checkable, not just
  * guarantee flags: `est(t) = min_r cells[r][h_r(t)]`, and each cell is
  * the collision SUM the oracle recomputes from the exact vocabulary
  * with the same poly-hash mirror. Buffer is a flat 4×256 long array
  * (8 KB per partial) regardless of vocabulary size.
  *
  * The hash stage stays OUTSIDE the aggregator: cell indices are computed
  * by the codegen'd [[PolyHash]] expression in the projection feeding the
  * agg, so engine and oracle share one hash definition and the UDAF is
  * pure increment/merge.
  */
object CountMin {

  val Depth = 4
  val Width = 256
  val Bases: Array[Long] = Array(131L, 139L, 149L, 151L)

  /** One row per token occurrence: its cell index in each of the 4 rows. */
  case class Cells(c0: Int, c1: Int, c2: Int, c3: Int)

  class Cms extends Aggregator[Cells, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](Depth * Width)

    override def reduce(b: Array[Long], x: Cells): Array[Long] = {
      b(x.c0) += 1
      b(Width + x.c1) += 1
      b(2 * Width + x.c2) += 1
      b(3 * Width + x.c3) += 1
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  def cms: Cms = new Cms
}
