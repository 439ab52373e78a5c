package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `min_shingle_md5(tokens, n)` — the minimal md5 over word n-gram
  * shingles, computed in ONE native pass: for each window position
  * the shingle string builds into a reused buffer, hashes, and only
  * the running minimum hex digest is kept. Exactly equals
  * `array_min(transform(shinglesOfTokens(t, n), md5))` — same
  * shingle construction (windows joined by one space, concat_ws null
  * skipping, whole array as the single shingle when size < n), same
  * lowercase-hex md5, same lexicographic min — but with no
  * interpreted lambda per shingle, no intermediate shingle array,
  * and no md5-string allocations beyond the running minimum.
  *
  * The dedup blocking key of [[graft.ops.DedupOps.jaccardNearDuplicates]]
  * runs through this: at corpus scale the fingerprint pass touches
  * every document, so the per-shingle interpreter overhead is the
  * difference between a scan-bound and a CPU-bound stage.
  */
case class MinShingleMd5(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<string>, got $other")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "min_shingle_md5"

  override protected def withNewChildInternal(newChild: Expression): MinShingleMd5 =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    MinShingleMd5.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinShingleMd5.compute($c, $n)")
}

object MinShingleMd5 {
  def of(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(MinShingleMd5(Bridge.expression(tokens), n))
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Static entry point shared by eval and generated code. */
  def compute(tokens: ArrayData, n: Int): UTF8String = {
    val size = tokens.numElements()
    val md = MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)

    def shingleAt(start: Int, len: Int): Unit = {
      sb.setLength(0)
      var i = 0
      var first = true
      while (i < len) {
        // concat_ws semantics: null elements are skipped entirely
        if (!tokens.isNullAt(start + i)) {
          if (!first) sb.append(' ')
          first = false
          sb.append(tokens.getUTF8String(start + i).toString)
        }
        i += 1
      }
    }

    var min: String = null
    val windows = if (size < n) 1 else size - n + 1
    val width = if (size < n) size else n
    var w = 0
    while (w < windows) {
      shingleAt(w, width)
      md.reset()
      val digest = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = hexDigits((digest(j) >> 4) & 0xf)
        hex(2 * j + 1) = hexDigits(digest(j) & 0xf)
        j += 1
      }
      val h = new String(hex)
      if (min == null || h.compareTo(min) < 0) min = h
      w += 1
    }
    if (min == null) null else UTF8String.fromString(min)
  }
}
