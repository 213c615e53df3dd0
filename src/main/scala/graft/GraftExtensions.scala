package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{FloatVectorDot, MixedVectorDot, ShingleGenerator}

/** Session extensions: exposes the library's native expressions to pure
  * SQL users. Install with
  * `spark.sql.extensions=graft.GraftExtensions` (spark-submit) or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`;
  * existing sessions can use
  * `GraftBridge.registerFunction(spark, "vec_dot", ...)`.
  *
  * After registration: `SELECT vec_dot(a.embedding, b.embedding) ...`,
  * `SELECT vec_dot_any(embedding, centroid) ...`, and
  * `SELECT doc_id, s.shingle FROM docs LATERAL VIEW
  *  shingles(split(text, ' ')) s AS shingle`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatVectorDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vec_dot_any"),
      new ExpressionInfo(classOf[MixedVectorDot].getName, "vec_dot_any"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MixedVectorDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShingleGenerator].getName, "shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShingleGenerator(exprs(0))))
  }
}
