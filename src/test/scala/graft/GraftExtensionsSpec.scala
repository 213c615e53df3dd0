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
}
