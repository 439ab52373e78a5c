package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native Bloom-filter membership probe over a driver-held bitset.
  *
  * The first form of `SketchOps.bloomMightContain` composed built-ins
  * — `getbit(element_at(<array literal>, pos>>6), pos&63)` × k — but
  * a 2^20-bit filter is a 16384-element ARRAY LITERAL, and
  * `element_at` walks a boxed `GenericArrayData` per probe: measured
  * ~2.6 µs per row at k=5 (0.63s over a 238k-shingle corpus slice,
  * ~3× the cost of generating the shingles themselves). At 100 TB the
  * probe runs once per corpus shingle — it must cost nanoseconds.
  *
  * This expression holds the `long[]` as a codegen REFERENCE object
  * (not source text, not boxed): `doGenCode` emits one static call
  * into [[BloomProbe.contains]], a tight primitive loop with
  * early-exit on the first clear bit. Bit derivation is identical to
  * `BloomFilterAggregator.set` (double hashing, `h2 = (h>>>32)|1`
  * forced odd), so filters built by the aggregator probe exactly.
  */
case class BloomProbeExpr(child: Expression, words: Array[Long],
    numHashes: Int) extends UnaryExpression {

  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint key hash, got ${child.dataType.catalogString}")

  override protected def withNewChildInternal(
      newChild: Expression): BloomProbeExpr = copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    BloomProbe.contains(words, input.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomProbe.contains($ref, $c, $numHashes)")
  }

  // the bitset compares by reference: two probes are only ever equal
  // when they literally share one filter, which is the safe direction
  // for plan canonicalization
}

object BloomProbe {

  /** Shared by the interpreted and generated paths — and the exact
    * mirror of `BloomFilterAggregator.set`'s bit positions. */
  def contains(words: Array[Long], h: Long, k: Int): Boolean = {
    val numBits = words.length.toLong * 64L
    val h2 = (h >>> 32) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(h + i.toLong * h2, numBits).toInt
      if ((words(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
