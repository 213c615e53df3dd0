package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the sql-private Column↔Expression converters —
  * the supported way for a library to surface custom Catalyst
  * expressions as Columns on Spark 4.x (where `new Column(expr)` is
  * no longer public). Nothing else from the private API is used.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a scalar expression builder under `name` in an existing
    * session's function registry (for sessions created without
    * `withExtensions`, e.g. shared test sessions). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
