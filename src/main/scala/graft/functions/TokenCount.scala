package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace token COUNT as a native Catalyst expression — the exact
  * integer twin of `size(split(trim(text), " "))`, the n_tok projection
  * every packing/budget/fertility operator starts from (14 sites), where
  * the token ARRAY itself is never consumed.
  *
  * The builtin form materializes one UTF8String per token plus the array
  * just to read its length — per-row allocation proportional to document
  * length in the single hottest map stage of the shard family's two
  * corpus passes. This §2.I ladder rung counts instead: one branch-free
  * byte scan, zero allocation. Equivalence is structural, not
  * approximate: `split(t, " ", -1)` on a single-space separator yields
  * exactly (#separators + 1) elements for ANY input including empty
  * ("" → [""], consecutive spaces → empty tokens — both engines keep
  * them), `trim` strips 0x20 only, and in UTF-8 the byte 0x20 can occur
  * only as the space character (every byte of a multi-byte sequence has
  * the high bit set) — so counting 0x20 bytes between the first and last
  * non-space byte is bit-equal to the builtin chain at every input.
  * `TokenCountSpec` pins the parity property corpus-wide and on the
  * adversarial edge set (empty, all-space, multi-space, NBSP, CJK).
  */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_count requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(s: Any): Any =
    TokenCount.count(s.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {
  /** #0x20 bytes strictly inside the space-trimmed span, plus one. */
  def count(s: UTF8String): Int = {
    val n = s.numBytes
    var i = 0
    while (i < n && s.getByte(i) == 0x20) i += 1
    var j = n - 1
    while (j >= i && s.getByte(j) == 0x20) j -= 1
    var c = 1
    while (i <= j) { if (s.getByte(i) == 0x20) c += 1; i += 1 }
    c
  }

  def tokenCount(c: Column): Column =
    GraftBridge.column(TokenCount(GraftBridge.expression(c)))
}
