package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded-heap top-k aggregator — the grouped form of
  * similarity top-k (SURVEY §7.4 names this as the one custom
  * aggregate worth building): global top-k is already optimal via
  * TakeOrderedAndProject, but *per-group* top-k ("k nearest
  * neighbors per query", "top documents per source") would otherwise
  * need a full window sort per group. The heap keeps O(k) state per
  * group and merges associatively, so Spark runs it with partial
  * aggregation: each partition reduces to k candidates before the
  * shuffle — at 100 TB that is the difference between shuffling k
  * rows per group and shuffling everything.
  *
  * Input: (id, score). Output: ids of the k highest scores,
  * descending, ties broken by lower id for determinism.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), List[(Double, Long)], Seq[Long]] {

  // sorted ascending-by-(score, -id): head is the weakest entry
  override def zero: List[(Double, Long)] = Nil

  private def insert(heap: List[(Double, Long)],
      e: (Double, Long)): List[(Double, Long)] = {
    val merged = (e :: heap).sortBy { case (s, id) => (s, -id) }
    if (merged.size > k) merged.tail else merged
  }

  override def reduce(heap: List[(Double, Long)],
      row: (Long, Double)): List[(Double, Long)] =
    insert(heap, (row._2, row._1))

  override def merge(a: List[(Double, Long)],
      b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(heap: List[(Double, Long)]): Seq[Long] =
    heap.sortBy { case (s, id) => (-s, id) }.map(_._2)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
