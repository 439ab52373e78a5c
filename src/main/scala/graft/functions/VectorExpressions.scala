package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding arithmetic — the hot
  * inner loop of every similarity operator (SimilarityOps). The
  * higher-order-function formulation (`aggregate(zip_with(...))`)
  * is correct but builds per-element closures and boxes through
  * InternalRow; these expressions instead compile to a tight primitive
  * `while` loop via `doGenCode`, staying inside whole-stage codegen.
  *
  * Semantics are IDENTICAL to the fold formulation, bit for bit:
  * left-to-right double accumulation, null result when lengths differ
  * or any scanned element is null (zip_with pads/propagates null the
  * same way), so swapping them in changes no query result.
  *
  * Extension ladder (per the design brief): these are level (b) —
  * custom scalar `Expression`s — used where level (a) composition had
  * a measurable constant-factor cost; no custom plan node is needed
  * because the surrounding operators (top-k, bucket join) are already
  * optimal Spark plans.
  */
abstract class VectorBinaryExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** JVM getter name for the element type ("getFloat"/"getDouble"). */
  protected def getter(e: Expression): String = elemType(e) match {
    case FloatType => "getFloat"
    case _ => "getDouble"
  }

  protected def elemAt(arr: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }
}

/** `vector_dot(a, b)` — Σ aᵢ·bᵢ accumulated left-to-right in double. */
case class VectorDot(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "vector_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lt = elemType(left); val rt = elemType(right)
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += elemAt(x, lt, i) * elemAt(y, rt, i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += (double) $a.${getter(left)}($i) * (double) $b.${getter(right)}($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })
}

/** `vector_cosine(a, b)` — cosine similarity in one array traversal
  * (dot and both norms accumulate in the same pass), 0.0 for a zero
  * vector. Equals `dot/(sqrt(dot(a,a))*sqrt(dot(b,b)))` exactly: each
  * of the three sums accumulates left-to-right like its fold twin.
  */
case class VectorCosine(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "vector_cosine"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorCosine =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lt = elemType(left); val rt = elemType(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = elemAt(x, lt, i); val yv = elemAt(y, rt, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xv = (double) $a.${getter(left)}($i);
         |    final double $yv = (double) $b.${getter(right)}($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |  }
         |}
       """.stripMargin
    })
}

/** IVF cell assignment as ONE expression: argmax over dot(vec, ĉⱼ)
  * against a k×d matrix held in the expression — under codegen the
  * matrix travels in the `references` array and the generated code
  * is one doubly-nested loop whose SIZE IS CONSTANT IN k. The
  * composed form (array_position over array(k VectorDots)) emits
  * O(k·d) bytecode, which at k ≈ √n centroids blows past the JVM's
  * huge-method JIT threshold and drops the hot loop into the
  * bytecode interpreter — measured 123 µs per 64-dim dot at k=142
  * on the 10× sweep (three ~350 s-CPU stages) vs ~0.1 µs compiled.
  *
  * Contract — identical to the composed coalesce(array_position(
  * scores, array_max(scores))−1, −1) on real data: per-centroid
  * scores accumulate left-to-right in double ((double) elem ·
  * matrix[j][i], index order); the FIRST maximal score wins (strict
  * >); −1 for a null vector, any null element, no length-matching
  * centroid, or an empty matrix (length-mismatched centroids are
  * skipped exactly like array_max skips their null dots). Known
  * divergence: a NaN score never wins here, while array_max ranks
  * NaN greatest — embeddings are finite by schema contract.
  */
case class VectorArgmaxDot(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  override def prettyName: String = "vector_argmax_dot"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override protected def withNewChildInternal(
      newChild: Expression): VectorArgmaxDot = copy(child = newChild)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${t.catalogString}")
  }

  /** Seq (structural equality → plan canonicalization and exchange
    * reuse work) in the tree; primitive arrays for the hot loop. */
  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return -1
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return -1; i += 1 }
    val f = isFloat
    var best = Double.NegativeInfinity
    var bi = -1
    var j = 0
    while (j < matrix.length) {
      val row = matrix(j)
      if (row.length == n) {
        var d = 0.0
        var k = 0
        while (k < n) {
          d += (if (f) a.getFloat(k).toDouble else a.getDouble(k)) * row(k)
          k += 1
        }
        if (bi < 0 || d > best) { best = d; bi = j }
      }
      j += 1
    }
    bi
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val m = ctx.addReferenceObj("centroids", matrix, "double[][]")
    val a = ctx.freshName("arr"); val n = ctx.freshName("n")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val k = ctx.freshName("k"); val d = ctx.freshName("dotv")
    val best = ctx.freshName("best"); val bi = ctx.freshName("bestIdx")
    val anyNull = ctx.freshName("anyNull"); val row = ctx.freshName("cent")
    val get = if (isFloat) "getFloat" else "getDouble"
    val block = code"""
      ${childGen.code}
      int $bi = -1;
      if (!${childGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${childGen.value};
        final int $n = $a.numElements();
        boolean $anyNull = false;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i)) { $anyNull = true; break; }
        }
        if (!$anyNull) {
          double $best = Double.NEGATIVE_INFINITY;
          for (int $j = 0; $j < $m.length; $j++) {
            final double[] $row = $m[$j];
            if ($row.length != $n) continue;
            double $d = 0.0;
            for (int $k = 0; $k < $n; $k++) {
              $d += (double) $a.$get($k) * $row[$k];
            }
            if ($bi < 0 || $d > $best) { $best = $d; $bi = $j; }
          }
        }
      }
      final int ${ev.value} = $bi;
    """
    ev.copy(code = block, isNull = FalseLiteral)
  }
}

/** SRP-LSH bucket id as ONE expression: the planes×d hyperplane
  * matrix rides the `references` array and the generated code is a
  * doubly-nested loop whose SIZE IS CONSTANT IN the plane count —
  * the [[VectorArgmaxDot]] lesson applied to the SRP family. The
  * composed form (Σ over p of when(vector_dot(v, lit(w_p)) ≥ 0,
  * 2^p, 0)) inlines planes×d literal doubles, and at the
  * count-derived width (planes = ⌈log₂ n⌉,
  * graft.ops.SimilarityOps.selfScalingPlanes) its generated method
  * grows with the corpus: measured at 10x (planes = 15), the q199
  * sweep pinned warm runs at ~3.1s in the slow JIT mode that the
  * constant-size loop removes (isolated converged runs: 0.7s).
  *
  * Contract — identical to the composed form on every input:
  * per-plane dots accumulate left-to-right in double; bit p is set
  * iff the dot is ≥ 0; a null vector, a null element, or a plane row
  * whose length differs from the vector's contributes bit 0 for that
  * plane (the composed when(null ≥ 0) falls to the otherwise-0 arm),
  * so degenerate rows land in bucket 0 under both spellings.
  */
case class VectorSrpBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  override def prettyName: String = "vector_srp_bucket"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override protected def withNewChildInternal(
      newChild: Expression): VectorSrpBucket = copy(child = newChild)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${t.catalogString}")
  }

  /** Seq in the tree (structural equality → canonicalization and
    * exchange reuse); primitive arrays for the hot loop. */
  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return 0L; i += 1 }
    val f = isFloat
    var bucket = 0L
    var p = 0
    while (p < matrix.length) {
      val row = matrix(p)
      if (row.length == n) {
        var d = 0.0
        var k = 0
        while (k < n) {
          d += (if (f) a.getFloat(k).toDouble else a.getDouble(k)) * row(k)
          k += 1
        }
        if (d >= 0) bucket |= 1L << p
      }
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val m = ctx.addReferenceObj("planes", matrix, "double[][]")
    val a = ctx.freshName("arr"); val n = ctx.freshName("n")
    val i = ctx.freshName("i"); val p = ctx.freshName("p")
    val k = ctx.freshName("k"); val d = ctx.freshName("dotv")
    val bucket = ctx.freshName("bucket")
    val anyNull = ctx.freshName("anyNull"); val row = ctx.freshName("plane")
    val get = if (isFloat) "getFloat" else "getDouble"
    val block = code"""
      ${childGen.code}
      long $bucket = 0L;
      if (!${childGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${childGen.value};
        final int $n = $a.numElements();
        boolean $anyNull = false;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i)) { $anyNull = true; break; }
        }
        if (!$anyNull) {
          for (int $p = 0; $p < $m.length; $p++) {
            final double[] $row = $m[$p];
            if ($row.length != $n) continue;
            double $d = 0.0;
            for (int $k = 0; $k < $n; $k++) {
              $d += (double) $a.$get($k) * $row[$k];
            }
            if ($d >= 0.0) $bucket |= 1L << $p;
          }
        }
      }
      final long ${ev.value} = $bucket;
    """
    ev.copy(code = block, isNull = FalseLiteral)
  }
}

/** [[VectorArgmaxDot]] with the centroid matrix read from a COLUMN
  * (`array<array<double>>`) instead of baked into the plan — the
  * fine-assignment half of two-level IVF blocking
  * (SimilarityOps.twoLevelAssign). A literal matrix caps at what the
  * driver can collect and every task can deserialize; past that the
  * matrix belongs in a broadcast RELATION, joined on the coarse cell,
  * and this expression scores the row's vector against whatever
  * centroid list the join delivered. Same tight primitive loop under
  * codegen — only the matrix source changes.
  *
  * Contract — the per-row twin of [[VectorArgmaxDot]]: scores
  * accumulate left-to-right in double; the FIRST maximal score wins
  * (strict >); −1 for a null vector, a null element in the vector, a
  * null/empty centroid list, or no centroid of matching length. A
  * null centroid row, or one containing a null element, is skipped
  * exactly like a length mismatch.
  */
case class VectorArgmaxDotCells(vec: Expression, cents: Expression)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cents
  override def prettyName: String = "vector_argmax_dot_cells"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorArgmaxDotCells =
    copy(vec = newLeft, cents = newRight)

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cents.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, array<array<double>>), " +
          s"got (${v.catalogString}, ${c.catalogString})")
    }

  private def isFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    val m = cents.eval(input)
    if (v == null || m == null) return -1
    val a = v.asInstanceOf[ArrayData]
    val rows = m.asInstanceOf[ArrayData]
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return -1; i += 1 }
    val f = isFloat
    var best = Double.NegativeInfinity
    var bi = -1
    var j = 0
    while (j < rows.numElements()) {
      if (!rows.isNullAt(j)) {
        val row = rows.getArray(j)
        if (row.numElements() == n) {
          var d = 0.0
          var ok = true
          var k = 0
          while (ok && k < n) {
            if (row.isNullAt(k)) ok = false
            else {
              d += (if (f) a.getFloat(k).toDouble else a.getDouble(k)) *
                row.getDouble(k)
              k += 1
            }
          }
          if (ok && (bi < 0 || d > best)) { best = d; bi = j }
        }
      }
      j += 1
    }
    bi
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecGen = vec.genCode(ctx)
    val centsGen = cents.genCode(ctx)
    val a = ctx.freshName("arr"); val rows = ctx.freshName("rows")
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val j = ctx.freshName("j"); val k = ctx.freshName("k")
    val d = ctx.freshName("dotv"); val ok = ctx.freshName("ok")
    val best = ctx.freshName("best"); val bi = ctx.freshName("bestIdx")
    val anyNull = ctx.freshName("anyNull"); val row = ctx.freshName("cent")
    val get = if (isFloat) "getFloat" else "getDouble"
    val block = code"""
      ${vecGen.code}
      ${centsGen.code}
      int $bi = -1;
      if (!${vecGen.isNull} && !${centsGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${vecGen.value};
        org.apache.spark.sql.catalyst.util.ArrayData $rows = ${centsGen.value};
        final int $n = $a.numElements();
        boolean $anyNull = false;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i)) { $anyNull = true; break; }
        }
        if (!$anyNull) {
          double $best = Double.NEGATIVE_INFINITY;
          for (int $j = 0; $j < $rows.numElements(); $j++) {
            if ($rows.isNullAt($j)) continue;
            org.apache.spark.sql.catalyst.util.ArrayData $row = $rows.getArray($j);
            if ($row.numElements() != $n) continue;
            double $d = 0.0;
            boolean $ok = true;
            for (int $k = 0; $ok && $k < $n; $k++) {
              if ($row.isNullAt($k)) { $ok = false; }
              else { $d += (double) $a.$get($k) * $row.getDouble($k); }
            }
            if ($ok && ($bi < 0 || $d > $best)) { $best = $d; $bi = $j; }
          }
        }
      }
      final int ${ev.value} = $bi;
    """
    ev.copy(code = block, isNull = FalseLiteral)
  }
}

/** [[VectorArgmaxDot]] generalized from argmax to TOP-N: the indices
  * of the `n` highest-dot centroids in the LITERAL matrix, ranked
  * (dot DESC, index ASC) — the coarse half of full two-level
  * multi-probe (SimilarityOps.twoLevelProbeWide): a row probes its
  * `n` nearest coarse cells, then the fine ranking merges across
  * them. Same carrier as the argmax (matrix in the codegen
  * references array, constant-size generated loop) — the composed
  * matmul + sort_array form would push a k-element interpreted sort
  * through every row.
  *
  * Contract: element 0 equals [[VectorArgmaxDot]]'s result whenever
  * the result is non-empty (same strict-> first-max rule, same
  * length-mismatch skip), equal scores rank the lower index first,
  * and top-m is the m-prefix of top-n for every m <= n. Returns an
  * empty array — never null — for a null vector, a null element, or
  * no matching centroid.
  */
case class VectorTopDot(child: Expression, centroids: Seq[Seq[Double]],
    n: Int) extends UnaryExpression {

  require(n > 0, "VectorTopDot: n must be positive")

  override def prettyName: String = "vector_top_dot"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override protected def withNewChildInternal(
      newChild: Expression): VectorTopDot = copy(child = newChild)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${t.catalogString}")
  }

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def empty: ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.emptyIntArray)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return empty
    val a = v.asInstanceOf[ArrayData]
    val nd = a.numElements()
    var i = 0
    while (i < nd) { if (a.isNullAt(i)) return empty; i += 1 }
    val f = isFloat
    val scores = new Array[Double](n)
    val idx = new Array[Int](n)
    var cnt = 0
    var j = 0
    while (j < matrix.length) {
      val row = matrix(j)
      if (row.length == nd) {
        var d = 0.0
        var k = 0
        while (k < nd) {
          d += (if (f) a.getFloat(k).toDouble else a.getDouble(k)) * row(k)
          k += 1
        }
        var pos = cnt
        while (pos > 0 && d > scores(pos - 1)) pos -= 1
        if (pos < n) {
          val last = math.min(cnt, n - 1)
          var s = last
          while (s > pos) { scores(s) = scores(s - 1); idx(s) = idx(s - 1); s -= 1 }
          scores(pos) = d; idx(pos) = j
          if (cnt < n) cnt += 1
        }
      }
      j += 1
    }
    if (cnt == 0) empty
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(idx, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val m = ctx.addReferenceObj("centroids", matrix, "double[][]")
    val a = ctx.freshName("arr"); val nd = ctx.freshName("nd")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val k = ctx.freshName("k"); val d = ctx.freshName("dotv")
    val scores = ctx.freshName("scores"); val idx = ctx.freshName("idx")
    val cnt = ctx.freshName("cnt"); val pos = ctx.freshName("pos")
    val s = ctx.freshName("s"); val last = ctx.freshName("last")
    val anyNull = ctx.freshName("anyNull"); val row = ctx.freshName("cent")
    val res = ctx.freshName("res")
    val get = if (isFloat) "getFloat" else "getDouble"
    val block = code"""
      ${childGen.code}
      int $cnt = 0;
      double[] $scores = new double[$n];
      int[] $idx = new int[$n];
      if (!${childGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${childGen.value};
        final int $nd = $a.numElements();
        boolean $anyNull = false;
        for (int $i = 0; $i < $nd; $i++) {
          if ($a.isNullAt($i)) { $anyNull = true; break; }
        }
        if (!$anyNull) {
          for (int $j = 0; $j < $m.length; $j++) {
            final double[] $row = $m[$j];
            if ($row.length != $nd) continue;
            double $d = 0.0;
            for (int $k = 0; $k < $nd; $k++) {
              $d += (double) $a.$get($k) * $row[$k];
            }
            int $pos = $cnt;
            while ($pos > 0 && $d > $scores[$pos - 1]) $pos--;
            if ($pos < $n) {
              final int $last = java.lang.Math.min($cnt, $n - 1);
              for (int $s = $last; $s > $pos; $s--) {
                $scores[$s] = $scores[$s - 1]; $idx[$s] = $idx[$s - 1];
              }
              $scores[$pos] = $d; $idx[$pos] = $j;
              if ($cnt < $n) $cnt++;
            }
          }
        }
      }
      final org.apache.spark.sql.catalyst.util.ArrayData $res =
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(java.util.Arrays.copyOf($idx, $cnt));
      final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $res;
    """
    ev.copy(code = block, isNull = FalseLiteral)
  }
}

/** [[VectorArgmaxDotCells]] generalized from argmax to TOP-N: the
  * indices of the `n` highest-dot centroids in the column-borne
  * matrix, ranked (dot DESC, index ASC) — the multi-probe dial of
  * the two-level cell-blocked family (SimilarityOps.twoLevelProbe).
  * Probing the row's `n` nearest fine cells instead of only its own
  * buys back the recall the blocked candidate rule trades (measured
  * ~0.19-0.20@10 at nprobe=1 by q189/q190) at a linear pair-cost
  * factor, the standard IVF recall/cost curve.
  *
  * Contract: element 0 equals [[VectorArgmaxDotCells]]'s result
  * whenever the result is non-empty (same strict-> first-max rule,
  * same skip rules for null/length-mismatched centroid rows), and
  * equal scores rank the LOWER index first. Returns an empty array —
  * never null — for a null vector, a null vector element, a null
  * centroid list, or no matching centroid; fewer than `n` valid
  * centroids return all of them. `n` is a plan-time constant (the
  * dial is an operator parameter, not data).
  */
case class VectorTopDotCells(vec: Expression, cents: Expression, n: Int)
    extends BinaryExpression {

  require(n > 0, "VectorTopDotCells: n must be positive")

  override def left: Expression = vec
  override def right: Expression = cents
  override def prettyName: String = "vector_top_dot_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorTopDotCells =
    copy(vec = newLeft, cents = newRight)

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cents.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, array<array<double>>), " +
          s"got (${v.catalogString}, ${c.catalogString})")
    }

  private def isFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def empty: ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.emptyIntArray)

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    val m = cents.eval(input)
    if (v == null || m == null) return empty
    val a = v.asInstanceOf[ArrayData]
    val rows = m.asInstanceOf[ArrayData]
    val nd = a.numElements()
    var i = 0
    while (i < nd) { if (a.isNullAt(i)) return empty; i += 1 }
    val f = isFloat
    // descending-ordered top-n by (score DESC, index ASC): iterating
    // j ascending with a STRICT > displacement keeps equal scores in
    // index order, matching argmax's first-max rule at slot 0
    val scores = new Array[Double](n)
    val idx = new Array[Int](n)
    var cnt = 0
    var j = 0
    while (j < rows.numElements()) {
      if (!rows.isNullAt(j)) {
        val row = rows.getArray(j)
        if (row.numElements() == nd) {
          var d = 0.0
          var ok = true
          var k = 0
          while (ok && k < nd) {
            if (row.isNullAt(k)) ok = false
            else {
              d += (if (f) a.getFloat(k).toDouble else a.getDouble(k)) *
                row.getDouble(k)
              k += 1
            }
          }
          if (ok) {
            var pos = cnt
            while (pos > 0 && d > scores(pos - 1)) pos -= 1
            if (pos < n) {
              val last = math.min(cnt, n - 1)
              var s = last
              while (s > pos) { scores(s) = scores(s - 1); idx(s) = idx(s - 1); s -= 1 }
              scores(pos) = d; idx(pos) = j
              if (cnt < n) cnt += 1
            }
          }
        }
      }
      j += 1
    }
    if (cnt == 0) empty
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(idx, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecGen = vec.genCode(ctx)
    val centsGen = cents.genCode(ctx)
    val a = ctx.freshName("arr"); val rows = ctx.freshName("rows")
    val nd = ctx.freshName("nd"); val i = ctx.freshName("i")
    val j = ctx.freshName("j"); val k = ctx.freshName("k")
    val d = ctx.freshName("dotv"); val ok = ctx.freshName("ok")
    val scores = ctx.freshName("scores"); val idx = ctx.freshName("idx")
    val cnt = ctx.freshName("cnt"); val pos = ctx.freshName("pos")
    val s = ctx.freshName("s"); val last = ctx.freshName("last")
    val anyNull = ctx.freshName("anyNull"); val row = ctx.freshName("cent")
    val res = ctx.freshName("res")
    val get = if (isFloat) "getFloat" else "getDouble"
    val block = code"""
      ${vecGen.code}
      ${centsGen.code}
      int $cnt = 0;
      double[] $scores = new double[$n];
      int[] $idx = new int[$n];
      if (!${vecGen.isNull} && !${centsGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${vecGen.value};
        org.apache.spark.sql.catalyst.util.ArrayData $rows = ${centsGen.value};
        final int $nd = $a.numElements();
        boolean $anyNull = false;
        for (int $i = 0; $i < $nd; $i++) {
          if ($a.isNullAt($i)) { $anyNull = true; break; }
        }
        if (!$anyNull) {
          for (int $j = 0; $j < $rows.numElements(); $j++) {
            if ($rows.isNullAt($j)) continue;
            org.apache.spark.sql.catalyst.util.ArrayData $row = $rows.getArray($j);
            if ($row.numElements() != $nd) continue;
            double $d = 0.0;
            boolean $ok = true;
            for (int $k = 0; $ok && $k < $nd; $k++) {
              if ($row.isNullAt($k)) { $ok = false; }
              else { $d += (double) $a.$get($k) * $row.getDouble($k); }
            }
            if (!$ok) continue;
            int $pos = $cnt;
            while ($pos > 0 && $d > $scores[$pos - 1]) $pos--;
            if ($pos < $n) {
              final int $last = java.lang.Math.min($cnt, $n - 1);
              for (int $s = $last; $s > $pos; $s--) {
                $scores[$s] = $scores[$s - 1]; $idx[$s] = $idx[$s - 1];
              }
              $scores[$pos] = $d; $idx[$pos] = $j;
              if ($cnt < $n) $cnt++;
            }
          }
        }
      }
      final org.apache.spark.sql.catalyst.util.ArrayData $res =
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(java.util.Arrays.copyOf($idx, $cnt));
      final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $res;
    """
    ev.copy(code = block, isNull = FalseLiteral)
  }
}

/** Dense vector×matrixᵀ as ONE expression: the k dot products of the
  * input vector against a k×d matrix held in the codegen references
  * array — [[VectorArgmaxDot]]'s carrier applied to the PROJECTION
  * case (Johnson–Lindenstrauss, any fixed linear map). The composed
  * form (`array(k VectorDots)`) emits O(k·d) bytecode whose JIT fate
  * is run-count-dependent: the q181 10x sweep read 0.3s or 2.9s for
  * the same plan depending on whether C2 ever compiled the huge
  * generated method. Here the loop is constant-size in k and d.
  *
  * Contract — identical to `array(k VectorDot(vec, lit(rowⱼ)))`:
  * element j accumulates left-to-right in double; a null vector, a
  * null vector element, or a vector whose length differs from the
  * matrix width yields an array of k NULL elements (each composed
  * dot is null there); the result array itself is never null. Matrix
  * rows must be uniform width (checked at construction).
  */
case class VectorMatmul(child: Expression, matrix: Seq[Seq[Double]])
    extends UnaryExpression {

  require(matrix.map(_.length).distinct.size <= 1,
    "VectorMatmul: matrix rows must have uniform width")

  override def prettyName: String = "vector_matmul"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false

  override protected def withNewChildInternal(
      newChild: Expression): VectorMatmul = copy(child = newChild)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${t.catalogString}")
  }

  @transient private lazy val m: Array[Array[Double]] =
    matrix.map(_.toArray).toArray

  private def width: Int = if (matrix.isEmpty) 0 else matrix.head.length

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def allNulls: ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Any](matrix.length))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return allNulls
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != width) return allNulls
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return allNulls; i += 1 }
    val f = isFloat
    val out = new Array[Double](m.length)
    var j = 0
    while (j < m.length) {
      val row = m(j)
      var d = 0.0
      var k = 0
      while (k < n) {
        d += (if (f) a.getFloat(k).toDouble else a.getDouble(k)) * row(k)
        k += 1
      }
      out(j) = d
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val mRef = ctx.addReferenceObj("matrix", m, "double[][]")
    val a = ctx.freshName("arr"); val n = ctx.freshName("n")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val k = ctx.freshName("k"); val d = ctx.freshName("dotv")
    val out = ctx.freshName("out"); val res = ctx.freshName("res")
    val bad = ctx.freshName("bad"); val row = ctx.freshName("mrow")
    val get = if (isFloat) "getFloat" else "getDouble"
    val block = code"""
      ${childGen.code}
      org.apache.spark.sql.catalyst.util.ArrayData $res = null;
      boolean $bad = ${childGen.isNull};
      if (!$bad) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${childGen.value};
        final int $n = $a.numElements();
        if ($n != $width) { $bad = true; }
        else {
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i)) { $bad = true; break; }
          }
        }
        if (!$bad) {
          double[] $out = new double[${m.length}];
          for (int $j = 0; $j < ${m.length}; $j++) {
            final double[] $row = $mRef[$j];
            double $d = 0.0;
            for (int $k = 0; $k < $n; $k++) {
              $d += (double) $a.$get($k) * $row[$k];
            }
            $out[$j] = $d;
          }
          $res = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
            .fromPrimitiveArray($out);
        }
      }
      if ($bad) {
        $res = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          new Object[${m.length}]);
      }
      final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $res;
    """
    ev.copy(code = block, isNull = FalseLiteral)
  }
}

object VectorExpressions {

  /** Column over the native dot product. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(VectorDot(
      org.apache.spark.sql.graftbridge.Bridge.expression(a), org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  /** Column over the native single-pass cosine. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(VectorCosine(
      org.apache.spark.sql.graftbridge.Bridge.expression(a), org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  /** Column over the native k-way argmax-dot (IVF assignment). */
  def argmaxDot(vec: Column, cents: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(VectorArgmaxDot(
      org.apache.spark.sql.graftbridge.Bridge.expression(vec), cents))

  /** Column over the native packed SRP bucket id (constant-size
    * codegen whatever the plane count). */
  def srpBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(VectorSrpBucket(
      org.apache.spark.sql.graftbridge.Bridge.expression(vec), planes))

  /** Column over the native vector×matrixᵀ (k dots in one
    * constant-size-codegen expression). */
  def matmul(vec: Column, matrix: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(VectorMatmul(
      org.apache.spark.sql.graftbridge.Bridge.expression(vec), matrix))

  /** Column over the per-row argmax-dot (two-level IVF fine
    * assignment: centroids arrive from a broadcast join, not the
    * plan). */
  def argmaxDotCells(vec: Column, cents: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(VectorArgmaxDotCells(
      org.apache.spark.sql.graftbridge.Bridge.expression(vec),
      org.apache.spark.sql.graftbridge.Bridge.expression(cents)))

  /** Column over the per-row TOP-N dot ranking (the multi-probe dial:
    * the n nearest fine cells, element 0 = the argmax cell). */
  def topDotCells(vec: Column, cents: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(VectorTopDotCells(
      org.apache.spark.sql.graftbridge.Bridge.expression(vec),
      org.apache.spark.sql.graftbridge.Bridge.expression(cents), n))

  /** Column over the literal-matrix TOP-N dot ranking (coarse
    * multi-probe: the n nearest coarse cells, element 0 = argmax). */
  def topDot(vec: Column, cents: Seq[Seq[Double]], n: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(VectorTopDot(
      org.apache.spark.sql.graftbridge.Bridge.expression(vec), cents, n))

  /** Column over the fused seed-derivation aggregate: one pass
    * yielding STRUCT<n, seeds> — the full count beside the k
    * smallest-(hash, id) vectors (see [[CountAndTopVectors]]). */
  def countAndTopVectors(hash: Column, id: Column, vec: Column,
      k: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(CountAndTopVectors(
      org.apache.spark.sql.graftbridge.Bridge.expression(hash),
      org.apache.spark.sql.graftbridge.Bridge.expression(id),
      org.apache.spark.sql.graftbridge.Bridge.expression(vec),
      k).toAggregateExpression())

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[VectorDot].getName, null, name, usage, "")

  /** A SQL function built from a Column-level composition: the
    * builder converts the call's argument expressions to Columns,
    * applies the library op, and hands the composed expression tree
    * back to the analyzer — the same mechanism Spark's own
    * `RuntimeReplaceable` sugar uses. */
  private def composed(name: String, usage: String)(
      f: Seq[Column] => Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, usage),
      (es: Seq[Expression]) => org.apache.spark.sql.graftbridge.Bridge.expression(
        f(es.map(org.apache.spark.sql.graftbridge.Bridge.column))))

  /** Function descriptors for SparkSessionExtensions.injectFunction /
    * FunctionRegistry: the native expressions as `vector_dot` /
    * `vector_cosine`, plus SQL spellings of the composite library
    * ops, so a pure-SQL user reaches them without the Scala API.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - dot product of two float/double arrays"),
      (es: Seq[Expression]) => VectorDot(es(0), es(1))),
    (FunctionIdentifier("int128_sum"),
      info("int128_sum",
        "int128_sum(x) - exact 128-bit integer sum of a BIGINT column as DECIMAL(38,0)"),
      // the analyzer wraps a bare AggregateFunction from the registry
      // into an AggregateExpression itself
      (es: Seq[Expression]) => Int128Sum(es(0))),
    (FunctionIdentifier("vector_cosine"),
      info("vector_cosine", "vector_cosine(a, b) - cosine similarity of two float/double arrays"),
      (es: Seq[Expression]) => VectorCosine(es(0), es(1))),
    (FunctionIdentifier("vector_argmax_dot_cells"),
      info("vector_argmax_dot_cells",
        "vector_argmax_dot_cells(v, cents) - index of the centroid in cents " +
          "(array<array<double>>) with the largest dot(v, c); -1 when none matches"),
      (es: Seq[Expression]) => VectorArgmaxDotCells(es(0), es(1))),
    (FunctionIdentifier("vector_top_dot_cells"),
      info("vector_top_dot_cells",
        "vector_top_dot_cells(v, cents, n) - indices of the n centroids in " +
          "cents (array<array<double>>) with the largest dot(v, c), ranked " +
          "(dot DESC, index ASC); empty array when none matches"),
      (es: Seq[Expression]) => {
        val n = es(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
              if v != null => v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"vector_top_dot_cells needs a literal n, got $other")
        }
        VectorTopDotCells(es(0), es(1), n)
      }),
    (FunctionIdentifier("vector_outer_sum"),
      info("vector_outer_sum",
        "vector_outer_sum(v) - upper-triangle sum of x*x^T in int128 picounit cells " +
          "as array<struct<i,j,sxy,n>> (covariance/PCA sufficient statistic)"),
      (es: Seq[Expression]) => VectorOuterSum(es(0))),
    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(s) - Unicode NFC canonical composition (DuckDB-compatible)"),
      (es: Seq[Expression]) => NfcNormalizeExpr(es(0))),
    composed("graft_hash_unit",
      "graft_hash_unit(id) - deterministic uniform [0,1) hash of an id (sampling threshold)") {
      es => graft.ops.SampleOps.hashUnit(es(0))
    },
    composed("graft_bpeish_count",
      "graft_bpeish_count(text) - BPE-family token budget (lookahead-free GPT-2-shape pre-tokenizer)") {
      es => graft.ops.TextOps.bpeishTokenCount(es(0))
    },
    composed("graft_zvalue",
      "graft_zvalue(x, y) - 16-bit Morton/Z-order interleave for two-dimensional layout") {
      es => graft.ops.LayoutOps.zValue(es(0), es(1), 16)
    },
    composed("graft_jaccard",
      "graft_jaccard(a, b) - token-set Jaccard similarity of two text columns") {
      es => graft.ops.DedupOps.jaccard(es(0), es(1))
    },
    composed("graft_simhash",
      "graft_simhash(text) - 32-bit SimHash of a text column") {
      es => graft.ops.DedupOps.simhash(es(0))
    },
    composed("graft_gopher_keep",
      "graft_gopher_keep(text) - Gopher-rule (Rae et al. 2021 A1.1) quality-gate verdict, canonical thresholds") {
      es => graft.ops.TextOps.gopherKeep(es(0))
    },
    composed("min_shingle_md5",
      "min_shingle_md5(text, n) - minimal md5 over word n-gram shingles (dedup blocking key)") {
      es =>
        val n = org.apache.spark.sql.graftbridge.Bridge.expression(es(1)) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"min_shingle_md5 needs a literal shingle size, got $other")
        }
        graft.functions.MinShingleMd5.of(graft.ops.TextOps.tokens(es(0)), n)
    })
}
