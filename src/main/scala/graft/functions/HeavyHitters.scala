package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving heavy-hitter summary (Metwally et al., "Efficient
  * Computation of Frequent and Top-k Elements in Data Streams", ICDT'05)
  * as a typed Dataset `Aggregator` — the engine's UDAF surface
  * (SURVEY.md §2.8). The summary is MERGEABLE in the Agarwal et al.
  * ("Mergeable Summaries", PODS'12) sense: per-partition partial
  * summaries combine associatively, so the aggregate runs as a normal
  * partial/final hash agg — no global sort, no full frequency table.
  *
  * Invariants (any merge order):
  *  - every stored estimate OVERcounts: est(t) >= true(t);
  *  - total overcount floor <= N / capacity;
  *  - any token with true(t) > N / capacity is GUARANTEED present.
  * The guarantee (not the raw estimates, which are order-dependent) is
  * the oracle-checked surface.
  */
object HeavyHitters {

  /** capacity=256 on the fixture corpora makes every true top-10 token
    * clear the N/capacity presence bound (spec-asserted) while the
    * sketch still genuinely evicts (vocab >> capacity).
    */
  val Capacity = 256

  /** counts: token -> overcounting estimate; floor: upper bound of any
    * evicted token's estimate (what a newly seen token resumes from).
    */
  case class Summary(counts: Map[String, Long], floor: Long)

  class SpaceSaving(capacity: Int) extends Aggregator[String, Summary, Map[String, Long]] {
    override def zero: Summary = Summary(Map.empty, 0L)

    private def evictTo(m: mutable.Map[String, Long], floor: Long, cap: Int): Summary = {
      var f = floor
      while (m.size > cap) {
        val (minK, minV) = m.minBy { case (k, v) => (v, k) }
        f = math.max(f, minV)
        m.remove(minK)
      }
      Summary(m.toMap, f)
    }

    override def reduce(b: Summary, token: String): Summary =
      b.counts.get(token) match {
        case Some(c) => Summary(b.counts.updated(token, c + 1), b.floor)
        case None =>
          // a token never seen may have been evicted at up to floor: resume
          // from floor + 1 (the overcount that makes the guarantee hold)
          val m = mutable.Map.from(b.counts)
          m.update(token, b.floor + 1)
          evictTo(m, b.floor, capacity)
      }

    override def merge(a: Summary, b: Summary): Summary = {
      // absent keys are worth at most the other side's floor — charge it
      // (Agarwal et al. §3.2: keeps est >= true through any merge tree)
      val m = mutable.Map.empty[String, Long]
      (a.counts.keySet ++ b.counts.keySet).foreach { k =>
        m.update(k, a.counts.getOrElse(k, a.floor) + b.counts.getOrElse(k, b.floor))
      }
      evictTo(m, a.floor + b.floor, capacity)
    }

    override def finish(r: Summary): Map[String, Long] = r.counts
    override def bufferEncoder: Encoder[Summary] = Encoders.kryo[Summary]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  def spaceSaving: SpaceSaving = new SpaceSaving(Capacity)
}
