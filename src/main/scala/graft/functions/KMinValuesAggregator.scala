package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed k-minimum-values aggregator: keeps the k smallest DISTINCT
  * doubles seen per group, sorted ascending. O(k) state, associative
  * and duplicate-insensitive merge — Spark partial-aggregates it
  * map-side, so a 100 TB group reduces each partition to ≤ k values
  * before the shuffle.
  *
  * This is the state of the KMV distinct-count sketch (see
  * `SketchOps.kmvDistinct`): over uniform [0,1) hashes the k-th
  * smallest order statistic estimates cardinality as (k-1)/h_(k).
  * Unlike HLL implementations, the state is plain order statistics —
  * any engine that can hash and sort reproduces it exactly, which is
  * what makes the sketch oracle-verifiable.
  */
final class KMinValuesAggregator(k: Int)
    extends Aggregator[Double, List[Double], Seq[Double]] {
  require(k >= 2, "KMV needs k >= 2")

  // Buffer invariant: DESCENDING order, so the current k-th smallest
  // (the reject threshold) is the HEAD — a saturated sketch rejects
  // each non-candidate in O(1). The first form kept the list
  // ascending and re-sorted on every row: O(k log k) per input
  // (measured: 4.2s for one sketch pair at k=256 over 600k rows —
  // the sketch cost more than the scan). Accepted inserts — O(log n)
  // of them once saturated — pay the O(k) splice; everything else is
  // one comparison. finish() reverses to the ascending contract.
  override def zero: List[Double] = Nil

  private def insert(mins: List[Double], v: Double): List[Double] =
    mins match {
      case h :: _ if mins.sizeIs >= k && v >= h => mins // saturated reject
      case _ if mins.contains(v) => mins
      case _ =>
        val (bigger, smaller) = mins.span(_ > v)
        val merged = bigger ::: (v :: smaller)
        if (merged.sizeIs > k) merged.tail else merged
    }

  override def reduce(mins: List[Double], v: Double): List[Double] =
    insert(mins, v)

  override def merge(a: List[Double], b: List[Double]): List[Double] =
    b.foldLeft(a)(insert)

  override def finish(mins: List[Double]): Seq[Double] = mins.reverse

  override def bufferEncoder: Encoder[List[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
