package graft

import org.apache.spark.sql.classic.GraftBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FloatVectorDot

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  test("vec_dot is callable from SQL after registration") {
    GraftBridge.registerFunction(spark, "vec_dot",
      exprs => FloatVectorDot(exprs(0), exprs(1)))
    val v = spark.sql(
      """SELECT vec_dot(
        |  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
      .collect().head.getDouble(0)
    assert(v == 11.0)
  }

  test("vec_dot_any accepts mixed float/double arrays from SQL") {
    GraftBridge.registerFunction(spark, "vec_dot_any",
      exprs => graft.functions.MixedVectorDot(exprs(0), exprs(1)))
    val v = spark.sql(
      """SELECT vec_dot_any(
        |  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |  array(3.0D, 4.0D)) AS d""".stripMargin)
      .collect().head.getDouble(0)
    assert(v == 11.0)
  }

  test("wrong arity raises a clean AnalysisException, not IndexOutOfBounds") {
    // exercise the exact builders the extensions inject, end-to-end
    // through SQL analysis in the shared session
    assert(GraftExtensions.functions.length == 3)
    GraftExtensions.functions.foreach { case (ident, _, builder) =>
      GraftBridge.registerFunction(spark, ident.funcName, builder)
    }
    Seq(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT)))",
      "SELECT vec_dot_any(array(1.0D), array(1.0D), array(1.0D))",
      "SELECT shingles()").foreach { q =>
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(q).collect()
      }
      assert(err.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION", q)
      assert(err.getMessage.contains("requires"), q)
    }
  }

  test("shingles UDTF works in a LATERAL VIEW") {
    GraftBridge.registerFunction(spark, "shingles",
      exprs => graft.functions.ShingleGenerator(exprs(0)))
    val rows = spark.sql(
      """SELECT s.shingle
        |FROM (SELECT 'a b c' AS t)
        |LATERAL VIEW shingles(split(t, ' ')) s AS shingle""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("a b", "b c"))
  }
}
