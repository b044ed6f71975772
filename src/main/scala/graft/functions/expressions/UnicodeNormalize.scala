package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd Unicode normalization of a string column (NFC or NFKC) —
 * the first pass of any multilingual training-data pipeline: the same
 * user-visible text arrives both precomposed ("é" U+00E9) and
 * decomposed ("e"+U+0301), and every downstream digest/shingle/dedup
 * operator treats those as different documents unless normalized
 * first.
 *
 * Spark has no built-in normalizer, and a Scala UDF would break
 * whole-stage codegen on the hottest full-corpus scan; this ~40-line
 * UnaryExpression keeps it inside codegen (same justification as
 * [[FloatVecDot]]). Implemented with `java.text.Normalizer` — Unicode
 * Annex #15 normalization, identical output to any conformant engine
 * (DuckDB's `nfc_normalize` oracles the NFC form exactly).
 *
 * Null in → null out. `form` must be "NFC" or "NFKC" (plan-time
 * constant, baked into the generated code).
 */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {

  require(form == "NFC" || form == "NFKC", s"unsupported normalization form: $form")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"UnicodeNormalize needs a string input, got ${child.dataType}")

  override def dataType: DataType = StringType

  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
