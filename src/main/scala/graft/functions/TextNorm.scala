package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen expression — the curation
  * pre-step that keeps canonically-equal text from defeating exact dedup
  * (NFD "e" + U+0301 vs NFC "é" are different bytes, different md5s,
  * different shingles). Spark has no builtin; a Scala UDF would break
  * whole-stage codegen around the very projections this feeds
  * (fingerprints, shingle hashers). JVM `java.text.Normalizer` implements
  * the Unicode standard forms, and for NFC is byte-compatible with
  * DuckDB's `nfc_normalize` — so the operator carries an exact
  * cross-engine oracle (q124).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  @transient private lazy val nf = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string, got ${child.dataType.catalogString}")
    else if (!Set("NFC", "NFD", "NFKC", "NFKD").contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be NFC|NFD|NFKC|NFKD, got $form")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, nf))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API entry points. */
object TextNorm {

  /** Unicode-normalize `c` to `form` (NFC default — the canonical
    * composition every curation pipeline should run before fingerprints
    * and shingles). */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    ColumnShim.column(UnicodeNormalize(ColumnShim.expression(c), form))
}
