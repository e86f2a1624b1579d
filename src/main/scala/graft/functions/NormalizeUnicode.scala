package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
  * expression — the text-fix step web-corpus pipelines run before any
  * hashing or dedup: the same visible string arrives from crawls in
  * decomposed (e + U+0301) and precomposed (é) forms, and every
  * hash-keyed operator in this library (exact dedup, MinHash shingles,
  * line hashes, URL keys) would treat them as different documents.
  * Normalize FIRST, hash after.
  *
  * Spark has no builtin for this; a Scala UDF would fall out of
  * whole-stage codegen exactly where this runs (the first map over
  * every document). Both paths delegate to `java.text.Normalizer`
  * (ICU-equivalent for the standard forms, present in every JVM):
  * `eval` for interpreted contexts, `doGenCode` emitting the direct
  * static call. NFC output is byte-identical to DuckDB's
  * `nfc_normalize` (q85's oracle).
  */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression {

  private val normForm = Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, normForm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeUnicode {
  /** Column wrapper: `NormalizeUnicode($"text")` → NFC by default. */
  def apply(col: Column, form: String = "NFC"): Column = {
    require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
      s"unknown normalization form $form")
    org.apache.spark.sql.GraftBridge.column(
      new NormalizeUnicode(
        org.apache.spark.sql.GraftBridge.expression(col), form))
  }
}
