package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(s)` — Unicode NFC normalization as a native codegen
  * Expression. Text ingested from the wild mixes composed ("é") and
  * decomposed ("e" + U+0301) forms of the same visible string; every
  * downstream equality — exact dedup, shingle hashing, token counts,
  * URL keys — silently treats them as different documents unless the
  * pipeline canonicalizes first. NFC is the web-standard choice.
  *
  * A scalar `Expression` (extension ladder level b): `doGenCode`
  * emits one static call, so the common case stays inside
  * whole-stage codegen with ZERO allocation — `Normalizer
  * .isNormalized` is a cheap scan (ASCII short-circuits on the
  * quick-check property) and already-NFC strings pass through as the
  * same object. Only strings that actually need recomposition pay
  * String round-trip + normalize. A Scala UDF would box every row
  * and hide the expression from the optimizer (no constant folding,
  * no null propagation).
  *
  * Mirrors DuckDB's `nfc_normalize` for cross-engine oracles.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string input, got ${child.dataType.catalogString}")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalizeExpr = copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.normalize($c)")
}

object NfcNormalize {

  /** Static entry point shared by the interpreted and generated
    * paths — one implementation, bit-identical results. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column API over the native expression. */
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(NfcNormalizeExpr(
      org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}
