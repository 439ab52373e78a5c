package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** `vector_outer_sum(v)` — the upper-triangle second-moment
  * sufficient statistic Σ x·xᵀ of an embedding column, as ONE native
  * aggregate: per input row a tight JIT-compiled loop accumulates
  * all dim·(dim+1)/2 pairwise products into an int128-per-cell
  * buffer; partitions each contribute one ~dim²-sized buffer to the
  * merge. This replaces the composed formulation (explode a
  * dim²-length struct array per row, hash-aggregate the (i, j) key
  * space) whose cost was never the arithmetic: at 10x data the
  * generate+aggregate of ~2·10⁹ interpreted-lambda structs ran ~3s
  * where this aggregate does the same long arithmetic in one pass
  * per row with zero per-pair allocation.
  *
  * Numeric contract — IDENTICAL to the composed form, bit for bit,
  * so the DuckDB oracle is unchanged: each product quantizes as
  * Spark's `round(xi·xj · 10¹²)` (decimal HALF_UP; for |x| < 2⁵²
  * that is round-on-exact-fraction with negative exact-half ties
  * moved away from zero — exact halves are binary-representable
  * there, a shortest-repr decimal ".5" exists iff the double IS an
  * exact half, and shortest-repr preserves ordering against the
  * exactly-representable 0.5), cast to long with JLS double→long
  * semantics, and summed
  * in 128-bit two's-complement (the [[Int128Sum]] limb algebra).
  * Null ELEMENTS skip their products but the row still counts, and
  * a null vector contributes nothing — both exactly as the exploded
  * struct form behaved. All input vectors must share one dimension
  * (the composed form silently mixed key spaces; mixed input here
  * is a loud error).
  *
  * Output: array<struct<i int, j int, sxy decimal(38,0), n bigint>>
  * over the upper triangle (i ≤ j), i/j 0-based, `n` the group row
  * count — `explode` it and finish (sxy/10¹², centering) in plain
  * column arithmetic. Buffer is 2 + 2·cells longs (dim 64 → ~33 KB);
  * driver/exchange cost is per-PARTITION, not per-row.
  */
case class VectorOuterSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "vector_outer_sum"
  override def nullable: Boolean = false

  private val cellStruct = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("sxy", DecimalType(38, 0), nullable = false),
    StructField("n", LongType, nullable = false)))
  override def dataType: DataType = ArrayType(cellStruct, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vector_outer_sum requires array<float|double>, got ${t.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // buffer layout: [dim, n, hi(cell0), lo(cell0), hi(cell1), ...]
  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  /** Spark `round(_, 0)` on double for |x| < 2⁵², then JLS
    * double→long (the non-ANSI Cast): NaN → 0, ±∞ saturates.
    *
    * Rounds on the EXACT fractional part (x − floor(x), exact in
    * doubles for |x| < 2⁵²) rather than floor(x + 0.5): the addition
    * itself can round across the half boundary — floor(
    * 0.49999999999999994 + 0.5) is 1, while round()'s decimal
    * HALF_UP on the shortest representation (which preserves the
    * &lt;0.5 ordering, 0.5 being exactly representable) yields 0. */
  private[graft] def quantize(x: Double): Long = {
    if (x != x) return 0L // NaN, as Cast(double→long) yields 0
    // HALF_UP is symmetric in magnitude (ties away from zero), so
    // round |x| and restore the sign: |x| − floor(|x|) is EXACT for
    // positive doubles below 2⁵² (Sterbenz), where x − floor(x) for
    // x ∈ (−1, 0) is not (1 − 0.49999999999999994 ties-to-even to
    // exactly 0.5, inventing a half that isn't there).
    val ax = math.abs(x)
    val f = math.floor(ax)
    val frac = ax - f
    val r = if (frac >= 0.5) f + 1.0 else f
    (if (x < 0) -r else r).toLong
  }

  /** int128 += p at cell c (limbs at 2+2c / 3+2c), wrapping adds. */
  private def add128(b: Array[Long], c: Int, p: Long): Unit = {
    val li = 3 + 2 * c
    val lo = b(li)
    val s = lo + p
    b(li) = s
    b(li - 1) += (p >> 63) + (((lo & p) | ((lo | p) & ~s)) >>> 63)
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val ad = v.asInstanceOf[ArrayData]
    val dim = ad.numElements()
    val b =
      if (buffer.isEmpty) {
        val cells = dim * (dim + 1) / 2
        val a = new Array[Long](2 + 2 * cells)
        a(0) = dim.toLong
        a
      } else buffer
    require(b(0) == dim.toLong,
      s"vector_outer_sum: mixed dimensions (${b(0)} vs $dim) — the " +
        "second-moment key space is per-dimension; filter or pad first")
    b(1) += 1
    val xs = new Array[Double](dim)
    val nulls = new Array[Boolean](dim)
    val float = isFloat
    var k = 0
    while (k < dim) {
      if (ad.isNullAt(k)) nulls(k) = true
      else xs(k) = if (float) ad.getFloat(k).toDouble else ad.getDouble(k)
      k += 1
    }
    var c = 0
    var i = 0
    while (i < dim) {
      val xi = xs(i)
      val ni = nulls(i)
      var j = i
      while (j < dim) {
        if (!ni && !nulls(j)) add128(b, c, quantize(xi * xs(j) * 1e12))
        c += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b2.isEmpty) return b1
    if (b1.isEmpty) return b2
    require(b1(0) == b2(0),
      s"vector_outer_sum: mixed dimensions across partitions (${b1(0)} vs ${b2(0)})")
    b1(1) += b2(1)
    val cells = (b1.length - 2) / 2
    var c = 0
    while (c < cells) {
      val li = 3 + 2 * c
      val lo = b1(li); val p = b2(li)
      val s = lo + p
      b1(li) = s
      b1(li - 1) += b2(li - 1) + (((lo & p) | ((lo | p) & ~s)) >>> 63)
      c += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = {
    if (buffer.isEmpty) return new GenericArrayData(Array.empty[Any])
    val dim = buffer(0).toInt
    val n = buffer(1)
    val two64 = BigInt(1) << 64
    val out = new Array[Any](dim * (dim + 1) / 2)
    var c = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val hi = buffer(2 + 2 * c)
        val lo = buffer(3 + 2 * c)
        val unsignedLo = if (lo < 0) BigInt(lo) + two64 else BigInt(lo)
        val total = BigInt(hi) * two64 + unsignedLo
        out(c) = new GenericInternalRow(Array[Any](
          i, j, Decimal(BigDecimal(total), 38, 0), n))
        c += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val out = new Array[Long](storage.length / 8)
    ByteBuffer.wrap(storage).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorOuterSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorOuterSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorOuterSum =
    copy(child = newChild)
}

object VectorOuterSum {
  /** Aggregate column: upper-triangle Σ x·xᵀ in picounit int128 cells;
    * see the case-class doc for the exact numeric contract. */
  def outerSum(c: Column): Column = Bridge.column(
    VectorOuterSum(Bridge.expression(c)).toAggregateExpression())
}
