package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over `array<float>` columns.
  *
  * The composable form — `aggregate(zip_with(a,b,(x,y)=>xd*yd),0.0,+)` —
  * is semantically right but higher-order functions are CodegenFallback:
  * every row allocates an intermediate array and interprets two lambdas
  * (~1 ms/pair measured at sf0.1, which made all-pairs similarity scans
  * two orders slower than the arithmetic requires). This expression is
  * the ladder rung SURVEY.md §2.I reserves for exactly this case: a
  * custom Catalyst `Expression` with `doGenCode` emitting a tight
  * primitive loop — no allocation, fused into whole-stage codegen.
  *
  * Bit-compatibility: the generated loop is the same left-to-right
  * `sum += (double)a[i] * (double)b[i]` fold the higher-order form (and
  * the DuckDB oracle's list_reduce) computes, so results stay
  * bit-identical with the verified semantics.
  *
  * Length mismatch ⇒ NULL — the same answer the composable form gives
  * (`zip_with` pads the short side with null, the product and sum then
  * propagate it) and the oracle's list_reduce produces; a silent
  * truncated partial product would diverge from both.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // mismatched lengths yield NULL even for non-null inputs
  override def nullable: Boolean = true

  // strict float-array inputs: getFloat over an array<double> would
  // reinterpret bytes and return silently wrong products — reject at
  // analysis time instead (SQL callers default literals to double).
  // (ExpectsInputTypes is private[sql], so the check is hand-rolled.)
  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left) && isFloatArray(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_dot requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** Mixed-precision dot product: each side may be `array<float>` or
  * `array<double>`; every element is promoted to double and the sum is
  * the same left fold as `FloatVectorDot` and the oracle's
  * `list_reduce` — bit-identical to the composable
  * `aggregate(zip_with(a,b,(x,y)=>xd*yd),0.0,+)` form, which is
  * CodegenFallback and interprets two lambdas per row. Used where one
  * operand is a learned (double) centroid.
  *
  * Length mismatch ⇒ NULL (same contract and rationale as
  * [[FloatVectorDot]]).
  */
case class MixedVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // mismatched lengths yield NULL even for non-null inputs
  override def nullable: Boolean = true

  private def elemOk(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left) && elemOk(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_dot_any requires array<float>/array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType match { case ArrayType(FloatType, _) => true; case _ => false }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def get(arr: String, float: Boolean) =
        if (float) s"((double) $arr.getFloat($i))" else s"$arr.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${get(a, isFloat(left))} * ${get(b, isFloat(right))};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MixedVectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** `dot(a, b)` over two `array<float>` columns, as a native codegen
    * expression. */
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(
      FloatVectorDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** `dot(a, b)` where either side is `array<float>` or `array<double>`
    * (same left fold in doubles). */
  def vecDotAny(a: Column, b: Column): Column =
    GraftBridge.column(
      MixedVectorDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
