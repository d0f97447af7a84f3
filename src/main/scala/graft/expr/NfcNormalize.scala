package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the
  * canonicalization pass a training-data pipeline runs before any
  * fingerprint/dedup stage, so that composed and decomposed spellings
  * of the same text (e.g. `é` vs `e`+U+0301) hash identically.
  *
  * Spark has no built-in normalizer, and the naive route (a Scala UDF
  * over `java.text.Normalizer`) breaks whole-stage codegen; this is
  * the custom-Expression tier instead: `doGenCode` emits a direct
  * static call, and the implementation short-circuits on
  * already-normalized input (the overwhelmingly common case — ASCII
  * and NFC text return the original UTF8String with zero copies).
  *
  * Portable: the DuckDB oracle's `nfc_normalize()` implements the same
  * Unicode normalization form, so x33 is fully oracle-checked.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  protected override def nullSafeEval(input: Any): Any =
    NfcImpl.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NfcImpl.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Shared by interpreted eval and generated code (static forwarder is
  * callable from Janino-generated Java). */
object NfcImpl {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: identity on already-NFC text (all ASCII qualifies) —
    // no allocation, the input UTF8String flows through untouched
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
