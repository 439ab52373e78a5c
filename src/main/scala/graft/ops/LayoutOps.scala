package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout operators: keys that make parquet row-group min/max
  * statistics prune on more than one column.
  *
  * A table sorted by (a, b) prunes scans filtered on `a` but not on
  * `b`. Sorting by the Z-value (bit-interleave of the two columns)
  * keeps rows close in BOTH dimensions close in the file order, so a
  * range filter on either column skips most row groups — the same
  * trick Delta's OPTIMIZE ZORDER applies, expressed here as a plain
  * deterministic column you pass to `sortWithinPartitions` /
  * `repartitionByRange` before writing. Pure integer arithmetic: no
  * UDF, codegen-friendly, engine-reproducible.
  */
object LayoutOps {

  /** Z-curve (Morton) key: interleaves the low `bits` bits of two
    * non-negative integer columns — x on even positions, y on odd.
    * Inputs are masked to `bits` (callers bucket/scale first;
    * 16+16 → a 32-bit key covers most layout needs). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31)
    val xs = x.cast("long"); val ys = y.cast("long")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb + yb
    }.reduce(_ + _)
  }

  /** Inverse of [[zValue]]: recover (x, y) from a Z key — mostly for
    * tests and debugging of layout keys. */
  def unZValue(z: Long, bits: Int = 16): (Long, Long) = {
    var x = 0L; var y = 0L
    var i = 0
    while (i < bits) {
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }
}
