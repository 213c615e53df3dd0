package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the text
  * canonicalization step every multilingual corpus takes before dedup
  * and tokenization (decomposed "e + U+0301" and precomposed "é" must
  * hash identically or every dedup family op silently misses pairs).
  *
  * Spark has no normalization builtin, and a Scala UDF here would break
  * whole-stage codegen in the hottest map stage of the pipeline; this is
  * the §2.I ladder rung for a scalar gap — a UnaryExpression whose
  * doGenCode stays inside codegen, calling the JDK's `java.text.Normalizer`
  * (ICU-correct for the canonical composition the pipeline needs, no new
  * dependency). The oracle twin is DuckDB's `nfc_normalize`; both
  * implement Unicode canonical composition, so results are byte-equal.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(NormalizeNfc.nfc(s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NormalizeNfc.nfc($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

object NormalizeNfc {
  /** NFC via the JDK; already-normalized strings (the overwhelmingly
    * common case) short-circuit on the quick-check without allocating. */
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  def normalizeNfc(c: Column): Column =
    GraftBridge.column(NormalizeNfc(GraftBridge.expression(c)))
}
