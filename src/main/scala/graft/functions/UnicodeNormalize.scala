package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) as a native Catalyst expression with
  * codegen — the canonicalization step a multilingual corpus needs *before*
  * any fingerprint/dedup pass: "é" as U+00E9 and as "e"+U+0301 are the
  * same text but different bytes, so un-normalized corpora under-deduplicate
  * (same content, different md5/minhash). A narrow per-row transform — no
  * shuffle, stays inside whole-stage codegen like [[RollingHash]].
  *
  * The form is a plan-time constant (NFC/NFD/NFKC/NFKD — resolved once at
  * construction, not per row). `java.text.Normalizer` and DuckDB's
  * `nfc_normalize` both implement UAX #15, so NFC output is byte-identical
  * across the two engines — which is exactly the property that lets a
  * normalized fingerprint computed by this engine match one computed
  * elsewhere (the oracle proves it via md5 over the normalized bytes).
  */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {

  // resolved eagerly: an invalid form fails at plan time, not mid-job
  private val form: Normalizer.Form = Normalizer.Form.valueOf(formName)

  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects STRING, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      Normalizer.normalize(v.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the resolved Form object once per task instead of re-running
    // Enum.valueOf's string lookup on every row of the hot loop
    val formRef = ctx.addReferenceObj("normForm", form,
      classOf[Normalizer.Form].getName)
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize($c.toString(), $formRef))")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  def unicode_normalize(c: Column, form: String): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))
}
