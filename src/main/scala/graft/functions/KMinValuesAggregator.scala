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

  override def zero: List[Double] = Nil

  private def insert(mins: List[Double], v: Double): List[Double] =
    if (mins.contains(v)) mins
    else {
      val merged = (v :: mins).sorted
      if (merged.size > k) merged.init else merged
    }

  override def reduce(mins: List[Double], v: Double): List[Double] =
    insert(mins, v)

  override def merge(a: List[Double], b: List[Double]): List[Double] =
    b.foldLeft(a)(insert)

  override def finish(mins: List[Double]): Seq[Double] = mins

  override def bufferEncoder: Encoder[List[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
