package graft

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {
  // Analyzer-time arity gate: a wrong-arg-count call like `shingles()`
  // must surface as Spark's standard WRONG_NUM_ARGS AnalysisException,
  // not an IndexOutOfBoundsException escaping from the builder.
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs =>
      if (exprs.length == n) build(exprs)
      else throw new AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> n.toString,
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** The injected function set; the single source for `apply` and for
    * registering into an existing session (tests, notebooks). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      arity("vec_dot", 2)(exprs => FloatVectorDot(exprs(0), exprs(1)))),
    (FunctionIdentifier("vec_dot_any"),
      new ExpressionInfo(classOf[MixedVectorDot].getName, "vec_dot_any"),
      arity("vec_dot_any", 2)(exprs => MixedVectorDot(exprs(0), exprs(1)))),
    (FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShingleGenerator].getName, "shingles"),
      arity("shingles", 1)(exprs => ShingleGenerator(exprs(0)))))
}
