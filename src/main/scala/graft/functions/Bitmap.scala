package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact re-aggregable distinct-count "bitmap" aggregates — the
  * ClickHouse `groupBitmap` / Druid bitmap-metric pattern: a partial
  * aggregate (one compressed id-set per fine-grained cell, e.g. per
  * day) that any coarser rollup MERGES without rescanning the facts,
  * and whose merge — set union — is EXACT, unlike the HLL sibling
  * (x_hll / x_hll_merge) whose merge trades exactness for fixed size.
  *
  * The serialized form is a sorted-distinct delta-varint stream
  * (LEB128): `varint(n) · varint(id_0) · varint(id_i − id_{i−1}) …`.
  * Dense id clusters cost ~1 byte per id, which is what makes shipping
  * per-cell id SETS through a shuffle viable — the scale premise of the
  * whole pattern (ids must first be densified: X-GLOBAL-IDS). Both
  * aggregators keep a hash-set buffer, so partial aggregation dedups
  * map-side before anything is encoded.
  *
  * Determinism: the finished value is the input SET — independent of
  * partitioning and merge order — so both the per-cell cardinalities
  * and the merged rollup are oracle-checkable against COUNT(DISTINCT).
  */
object Bitmap {

  /** Per-cell partial: exact cardinality + the encoded id set. */
  case class Bm(n: Long, bytes: Array[Byte])

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Encode a set as sorted delta-varints. Ids must be non-negative. */
  def encode(set: scala.collection.mutable.HashSet[Long]): Array[Byte] = {
    val sorted = set.toArray
    java.util.Arrays.sort(sorted)
    val out = new java.io.ByteArrayOutputStream(sorted.length + 4)
    writeVarint(out, sorted.length.toLong)
    var prev = 0L
    var i = 0
    while (i < sorted.length) {
      val id = sorted(i)
      require(id >= 0, s"bitmap ids must be non-negative, got $id")
      writeVarint(out, if (i == 0) id else id - prev)
      prev = id
      i += 1
    }
    out.toByteArray
  }

  /** Decode an encoded set into `into`; returns the stored cardinality. */
  def decodeInto(bytes: Array[Byte], into: scala.collection.mutable.HashSet[Long]): Long = {
    var pos = 0
    def readVarint(): Long = {
      var v = 0L; var shift = 0
      var b = bytes(pos) & 0xff; pos += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift; shift += 7
        b = bytes(pos) & 0xff; pos += 1
      }
      v | (b.toLong << shift)
    }
    val n = readVarint()
    var prev = 0L
    var i = 0L
    while (i < n) {
      prev = if (i == 0) readVarint() else prev + readVarint()
      into += prev
      i += 1
    }
    n
  }

  /** Build stage: raw ids → one (cardinality, encoded set) partial. */
  class Build extends Aggregator[Long, scala.collection.mutable.HashSet[Long], Bm] {
    override def zero: scala.collection.mutable.HashSet[Long] =
      scala.collection.mutable.HashSet.empty[Long]
    override def reduce(b: scala.collection.mutable.HashSet[Long], id: Long)
        : scala.collection.mutable.HashSet[Long] = { b += id; b }
    override def merge(a: scala.collection.mutable.HashSet[Long],
                       b: scala.collection.mutable.HashSet[Long])
        : scala.collection.mutable.HashSet[Long] = { a ++= b; a }
    override def finish(b: scala.collection.mutable.HashSet[Long]): Bm =
      Bm(b.size.toLong, encode(b))
    override def bufferEncoder: Encoder[scala.collection.mutable.HashSet[Long]] =
      Encoders.kryo[scala.collection.mutable.HashSet[Long]]
    override def outputEncoder: Encoder[Bm] = ExpressionEncoder[Bm]()
  }

  /** Rollup stage: encoded partials → exact cardinality of their union. */
  class MergeCount extends Aggregator[Array[Byte], scala.collection.mutable.HashSet[Long], Long] {
    override def zero: scala.collection.mutable.HashSet[Long] =
      scala.collection.mutable.HashSet.empty[Long]
    override def reduce(b: scala.collection.mutable.HashSet[Long], bytes: Array[Byte])
        : scala.collection.mutable.HashSet[Long] = { decodeInto(bytes, b); b }
    override def merge(a: scala.collection.mutable.HashSet[Long],
                       b: scala.collection.mutable.HashSet[Long])
        : scala.collection.mutable.HashSet[Long] = { a ++= b; a }
    override def finish(b: scala.collection.mutable.HashSet[Long]): Long = b.size.toLong
    override def bufferEncoder: Encoder[scala.collection.mutable.HashSet[Long]] =
      Encoders.kryo[scala.collection.mutable.HashSet[Long]]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  def build: Build = new Build
  def mergeCount: MergeCount = new MergeCount
}
