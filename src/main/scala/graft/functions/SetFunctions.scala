package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Multiset intersection count of two SORTED `array<long>` columns, by
  * two-pointer merge: for each value present in both arrays the count
  * contribution is runLen(a) × runLen(b) — exactly the row count an
  * equi-join of the two (doc, h) row sets produces on that key. That
  * makes `SortedIntersectCount(hsA, hsB)` the per-pair equivalent of the
  * inverted-index self-join + `GROUP BY (d1,d2)` + `count(*)` the
  * pair-similarity oracles (q27/q55) state — including the (negligible,
  * ~vocab²/2⁶¹) token-hash-collision case, where both forms count the
  * product of per-document multiplicities, NOT the distinct-value
  * overlap `array_intersect` would report.
  *
  * Why an expression and not the join: counting intersections through
  * the join shuffles one row per SHARED SHINGLE OCCURRENCE and then
  * hash-aggregates candidate-pair keys — at 10× corpus scale that
  * aggregation (314M rows → 78M groups at sf1) was the single most
  * expensive stage in the suite. Verifying per candidate pair against
  * two compact sorted arrays is O(|A|+|B|) with zero allocation, fuses
  * into whole-stage codegen, and needs no shuffle at all when the
  * array table is broadcast.
  *
  * The merge requires both inputs sorted ascending (the producer uses
  * `sort_array`); it never fails on unsorted input, it just undercounts
  * — producers own the invariant.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left) && isLongArray(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sorted_intersect_count requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var cnt = 0L
    var i = 0
    var j = 0
    while (i < na && j < nb) {
      val va = x.getLong(i)
      val vb = y.getLong(j)
      if (va < vb) i += 1
      else if (va > vb) j += 1
      else {
        var i2 = i + 1
        while (i2 < na && x.getLong(i2) == va) i2 += 1
        var j2 = j + 1
        while (j2 < nb && y.getLong(j2) == va) j2 += 1
        cnt += (i2 - i).toLong * (j2 - j)
        i = i2
        j = j2
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val i2 = ctx.freshName("i2")
      val j2 = ctx.freshName("j2")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |long $cnt = 0L;
         |int $i = 0;
         |int $j = 0;
         |while ($i < $na && $j < $nb) {
         |  long $va = $a.getLong($i);
         |  long $vb = $b.getLong($j);
         |  if ($va < $vb) { $i++; }
         |  else if ($va > $vb) { $j++; }
         |  else {
         |    int $i2 = $i + 1;
         |    while ($i2 < $na && $a.getLong($i2) == $va) { $i2++; }
         |    int $j2 = $j + 1;
         |    while ($j2 < $nb && $b.getLong($j2) == $va) { $j2++; }
         |    $cnt += (long) ($i2 - $i) * ($j2 - $j);
         |    $i = $i2;
         |    $j = $j2;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SetFunctions {
  /** `Column` wrapper for [[SortedIntersectCount]]. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedIntersectCount(GraftBridge.expression(a), GraftBridge.expression(b)))
}
