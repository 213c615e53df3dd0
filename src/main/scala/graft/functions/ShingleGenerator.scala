package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating function (UDTF) emitting the 2-word shingles of a
  * token array: one output row per adjacent token pair — the Generator
  * rung of the custom-function ladder (SURVEY.md §2.I), alongside the
  * codegen scalar (`FloatVectorDot`) and the typed Aggregator
  * (`MinHashAggregator`).
  *
  * Why a Generator rather than an array-lambda + explode: higher-order
  * functions are CodegenFallback with no common-subexpression
  * elimination, so a `transform(sequence(...), i -> w[i] || w[i+1])`
  * whose `w` gets alias-inlined by the optimizer re-evaluates the
  * tokenizer per element (O(n²) per document). A Generator's child is
  * evaluated exactly ONCE per input row inside `GenerateExec`, then the
  * output rows stream — structurally immune to that rewrite, with no
  * window/sort needed to pair neighbors.
  *
  * Null or single-token inputs produce no rows (the document simply has
  * no shingles), matching the null-dropping oracle semantics.
  */
case class ShingleGenerator(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles() requires array<string>, got ${other.simpleString}")
  }

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < 2) Nil
    else {
      val n = arr.numElements()
      val out = new Array[InternalRow](n - 1)
      var i = 0
      while (i < n - 1) {
        val a = arr.getUTF8String(i)
        val b = arr.getUTF8String(i + 1)
        // null tokens cannot occur from split(); emit defensively anyway
        val s =
          if (a == null || b == null) null
          else UTF8String.concat(a, space, b)
        out(i) = InternalRow(s)
        i += 1
      }
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
}
