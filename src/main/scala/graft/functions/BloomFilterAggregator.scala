package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bit-packed Bloom filter over pre-hashed 64-bit keys.
  *
  * Input rows are already `xxhash64(key)` values computed by Spark's
  * codegen'd hash; the aggregator derives `numHashes` bit positions
  * per key by double hashing (h + i·h2 with h2 = (h >>> 32) | 1,
  * forced odd so the stride cycles the whole table) and ORs them into
  * an Array[Long] bitset. The same positions are recomputed on the
  * probe side with pure column arithmetic (`SketchOps
  * .bloomMightContain`), so membership never leaves codegen.
  *
  * Merge is elementwise OR — associative, commutative and
  * duplicate-insensitive — so Spark partial-aggregates map-side and
  * each build-side partition ships only numBits/8 bytes to the
  * driver, the same shape as Spark's own runtime bloom-filter join
  * pruning. 2^20 bits = 128 KiB; with k=5 hashes that holds ~100k
  * keys at ~2% false positives (false positives only cost wasted
  * probe rows — the real join still decides membership exactly).
  */
final class BloomFilterAggregator(numBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  private def set(words: Array[Long], h: Long): Array[Long] = {
    val h2 = (h >>> 32) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(h + i.toLong * h2, numBits.toLong).toInt
      words(pos >> 6) |= (1L << (pos & 63))
      i += 1
    }
    words
  }

  override def reduce(words: Array[Long], h: Long): Array[Long] =
    set(words, h)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(words: Array[Long]): Array[Long] = words

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
