package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demo: a Spark DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Contract (driver-enforced, see SparkEntry):
  *   - `fn(spark, sfDir)` must be deterministic: total ordering via
  *     explicit tie-breaks, exact (decimal-routed) float aggregation.
  *   - column names in the result and the oracle SQL must match exactly
  *     (the driver sorts columns by name before hashing).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle.stripMargin.trim))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
