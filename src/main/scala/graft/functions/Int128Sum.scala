package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Exact 128-bit integer sum as a native Catalyst declarative
  * aggregate — the warehouse-engine money-sum pattern (int64 values,
  * int128 accumulator) expressed in Spark.
  *
  * Spark's built-in `sum` over `DECIMAL(p, s)` widens the accumulator
  * to `DECIMAL(p+10, s)`; past 18 digits every per-row add leaves the
  * compact long representation and allocates through BigDecimal —
  * measured at ~2-3× the cost of the whole q01 scan. Columnar engines
  * instead sum scaled integers in an int128 register. This aggregate
  * does the same with tools Spark already has: the buffer is two LONG
  * slots (hi/lo limbs), the per-row update is a handful of 64-bit
  * bitwise ops that whole-stage codegen compiles into straight-line
  * long arithmetic, and only the per-group finalization touches
  * BigDecimal.
  *
  * All limb arithmetic uses wrapping (LEGACY) adds — two's-complement
  * wraparound IS the carry mechanism, so ANSI overflow checking must
  * not intervene. Overflow of the int128 itself would need >1.7e19
  * max-long rows per group — unreachable.
  *
  * `exactScaledSum(c, dp)` is the user surface: sums
  * `round(c · 10^dp)` (exact while each row's scaled value fits in a
  * long) and finalizes to `DECIMAL(38, dp)`, order-independent across
  * partitions and tasks by construction.
  */
case class Int128Sum(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def prettyName: String = "int128_sum"
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 0)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int128_sum requires BIGINT input, got ${child.dataType.catalogString}")

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  /** Wrapping long add: two's-complement wraparound is intentional. */
  private def wadd(l: Expression, r: Expression): Expression =
    Add(l, r, EvalMode.LEGACY)

  /** Carry-out of the unsigned add `l + r = s` (standard identity:
    * a carry happened iff both operands had the top bit, or either
    * had it and the sum does not). */
  private def carry(l: Expression, r: Expression, s: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(l, r), BitwiseAnd(BitwiseOr(l, r), BitwiseNot(s))),
      Literal(63))

  override lazy val updateExpressions: Seq[Expression] = {
    val v = child
    val newLo = wadd(lo, v)
    // sign-extended high limb of v plus the carry out of the low add
    val newHi = wadd(wadd(hi, ShiftRight(v, Literal(63))), carry(lo, v, newLo))
    Seq(
      If(IsNull(v), hi, newHi),
      If(IsNull(v), lo, newLo),
      Or(seen, IsNotNull(v)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val newLo = wadd(lo.left, lo.right)
    val newHi = wadd(wadd(hi.left, hi.right), carry(lo.left, lo.right, newLo))
    Seq(newHi, newLo, Or(seen.left, seen.right))
  }

  /** Finalize the limb pair into DECIMAL(38,0) with plain decimal
    * arithmetic (runs once per group, stays codegen-friendly):
    * hi·2⁶⁴ + unsigned(lo), where unsigned(lo) adds 2⁶⁴ back when
    * the low limb's sign bit is set. */
  override lazy val evaluateExpression: Expression = {
    val d38 = DecimalType(38, 0)
    val two64 = Literal(Decimal(BigDecimal(2).pow(64), 38, 0), d38)
    val loD = Cast(lo, d38)
    val unsignedLo =
      If(LessThan(lo, Literal(0L)), Add(loD, two64, EvalMode.LEGACY), loD)
    val total = Add(Multiply(Cast(hi, d38), two64, EvalMode.LEGACY),
      unsignedLo, EvalMode.LEGACY)
    If(seen, Cast(total, dataType), Literal(null, dataType))
  }

  override protected def withNewChildInternal(newChild: Expression): Int128Sum =
    copy(child = newChild)
}

object Int128Sum {
  import org.apache.spark.sql.functions._

  /** Exact int128 sum of an already-long column as DECIMAL(38, 0) —
    * DuckDB's `sum(BIGINT) → HUGEINT` with the same semantics (null
    * on empty/all-null input, nulls skipped). */
  def exactLongSum(c: Column): Column = Bridge.column(
    Int128Sum(Bridge.expression(c.cast(LongType))).toAggregateExpression())

  /** Exact decimal-valued sum of `c` at `dp` decimal places, summed
    * at long speed: rounds each row to an integer number of 10^-dp
    * units, accumulates in int128, finalizes to DECIMAL(38, dp).
    * Exact as long as each ROW's scaled value fits in a long
    * (|v| < 9.2e18 / 10^dp) — the sum itself cannot overflow.
    *
    * `dp` is capped at 6: Spark's decimal-division precision rule
    * caps the DECIMAL(38,0)/10^dp quotient at precision 38 and, once
    * capped, reduces its scale to min(scale, 6) — so any dp > 6
    * would be SILENTLY rounded at 6 places before the final cast
    * padded zeros back. (Per-row scaling in double also degrades
    * past 2^53/10^dp; at dp ≤ 6 money-sized values stay exact.)
    * Wider-scale exact sums belong on the decimal accumulator
    * (see ClassifierOps's 12-dp matched mass).
    */
  def exactScaledSum(c: Column, dp: Int): Column = {
    require(dp >= 0 && dp <= 6,
      s"exactScaledSum supports 0..6 decimal places, got $dp: Spark's " +
        "precision-loss rule rounds a precision-capped quotient at scale 6, " +
        "so higher dp would silently lose digits — use a decimal-typed sum")
    val scaled = round(c * math.pow(10, dp).toLong).cast(LongType)
    val unscaled = Bridge.column(
      Int128Sum(Bridge.expression(scaled)).toAggregateExpression())
    if (dp == 0) unscaled
    else (unscaled / math.pow(10, dp).toLong).cast(DecimalType(38, dp))
  }
}
