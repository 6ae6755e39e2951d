package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical (NFC) normalization as a native codegen'd
  * expression — the canonicalization every hash-based text operator in
  * this engine silently depends on: composed (`é`, U+00E9) and
  * decomposed (`e` + combining acute U+0301) renderings of IDENTICAL
  * text hash, shingle, MinHash-sign and SimHash differently, and real
  * corpora mix the two freely (OCR, keyboards, export pipelines each
  * pick a form). Run it before fingerprinting/dedup so equal text is
  * equal bytes.
  *
  * Spark has no built-in; the JDK's `java.text.Normalizer` is the
  * implementation, invoked straight from generated code — no UDF
  * boxing, the projection stays inside whole-stage codegen. The name
  * and semantics match DuckDB's `nfc_normalize`, which is what lets the
  * `q_unicode_nfc` value oracle check the behavior cross-engine.
  * ASCII-only rows round-trip unchanged (NFC is the identity there).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}
