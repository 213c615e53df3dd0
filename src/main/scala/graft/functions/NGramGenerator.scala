package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating function emitting the space-joined `n`-token windows
  * of a token array: one output row per window start — the k-gram
  * generalization of [[ShingleGenerator]] (whose scaladoc explains why a
  * Generator beats an array-lambda + explode here: the child tokenizer
  * is evaluated exactly once per document inside `GenerateExec`,
  * structurally immune to the optimizer alias-inlining that makes
  * `transform(sequence(...), i -> ...)` re-tokenize per element).
  *
  * Used by the duplicated-span detector (q101), where the window is the
  * passage-level dedup unit (the windowed-hash realization of
  * suffix-array substring dedup). Documents with fewer than `n` tokens
  * produce no rows.
  */
case class NGramGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 2, s"ngrams() window must be >= 2 tokens, got $n")

  override def elementSchema: StructType =
    StructType(StructField("gram", StringType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngrams() requires array<string>, got ${other.simpleString}")
  }

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) Nil
    else {
      val m = arr.numElements()
      val toks = new Array[UTF8String](m)
      var i = 0
      while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
      val out = new Array[InternalRow](m - n + 1)
      var s = 0
      while (s <= m - n) {
        // interleave tokens with single spaces: n tokens + (n-1) spaces
        val parts = new Array[UTF8String](2 * n - 1)
        var j = 0
        while (j < n) {
          val t = toks(s + j)
          parts(2 * j) = if (t == null) UTF8String.EMPTY_UTF8 else t
          if (j < n - 1) parts(2 * j + 1) = space
          j += 1
        }
        out(s) = InternalRow(UTF8String.concat(parts: _*))
        s += 1
      }
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramGenerator =
    copy(child = newChild)
}
