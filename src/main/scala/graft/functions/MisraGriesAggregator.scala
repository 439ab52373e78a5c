package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Misra-Gries frequent-items summary: at most k−1 counters per
  * group, O(k) state, mergeable (Agarwal et al., "Mergeable
  * Summaries", PODS 2012) — Spark partial-aggregates it map-side, so
  * a 100 TB pass reduces each partition to ≤ k−1 (value, count)
  * pairs before the shuffle.
  *
  * Guarantee: every value with true frequency > n/k survives in the
  * final summary REGARDLESS of merge order (each decrement step
  * destroys k occurrences, of which at most one belongs to any single
  * value, and there are at most n/k such steps). Counter values
  * themselves are merge-order-dependent, so consumers must treat the
  * output as a candidate set, not counts — `SketchOps.heavyHitters`
  * re-counts candidates exactly in a second pass, making the end
  * result deterministic and oracle-checkable.
  */
final class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k >= 2, "Misra-Gries needs k >= 2")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], v: String): Map[String, Long] =
    m.get(v) match {
      case Some(c) => m.updated(v, c + 1L)
      case None if m.size < k - 1 => m.updated(v, 1L)
      case None =>
        // decrement-all step: one occurrence of each tracked value and
        // the incoming one cancel together
        m.iterator.collect { case (key, c) if c > 1L => key -> (c - 1L) }.toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = (a.keySet ++ b.keySet).iterator
      .map(key => key -> (a.getOrElse(key, 0L) + b.getOrElse(key, 0L)))
      .toMap
    if (combined.size <= k - 1) combined
    else {
      // subtract the k-th largest count from all; ≤ k−1 survive
      val ck = combined.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k - 1)
      combined.iterator.collect {
        case (key, c) if c - ck > 0L => key -> (c - ck)
      }.toMap
    }
  }

  override def finish(m: Map[String, Long]): Seq[String] = m.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
