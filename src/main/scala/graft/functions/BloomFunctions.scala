package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Scan-side Bloom probe over a 64-bit key column.
  *
  * This is the join-pruning shape a 100 TB decontamination pass needs:
  * the probe side (an eval suite's n-gram set) is aggregated ONCE into a
  * ~10-bits-per-key Bloom filter — orders of magnitude smaller than the
  * hash relation a broadcast join would ship — and the corpus scan
  * filters through it inside whole-stage codegen, so the overwhelmingly
  * non-matching corpus rows die at the scan without ever reaching join
  * machinery. The few survivors (true matches + the filter's false
  * positives) then flow into an ordinary exact join that removes the
  * false positives, which is why the final result is bit-identical to
  * the plain join the oracle runs: the Bloom stage can only pass
  * supersets, never drop a true match (no false negatives), so the
  * composed operator is exact regardless of the filter's fpp. The same
  * structure is what Spark's own runtime row-level filtering
  * (`InjectRuntimeFilter`) builds for selective shuffle joins; here it
  * is an explicit, reusable library rung (SURVEY.md §2.I) because the
  * probe side is a pre-built artifact, not a join build side.
  *
  * The filter bits travel as a task-broadcast reference object
  * (`ctx.addReferenceObj`), deserialized once per executor — never per
  * row. Null key ⇒ null, the same three-valued logic as `IN`.
  */
case class BloomMightContainLong(child: Expression, bits: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a BIGINT key, got ${other.simpleString}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bits))

  override def nullSafeEval(h: Any): Any =
    bloom.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.mightContainLong($h);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong = copy(child = newChild)
}

object BloomFunctions {
  /** `might_contain(keyCol)` against a pre-built filter, as a Column. */
  def mightContainLong(key: Column, bloom: BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    GraftBridge.column(
      BloomMightContainLong(GraftBridge.expression(key), out.toByteArray))
  }
}
