package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator module contributes `QueryDef`s (Spark program + DuckDB
  * oracle); this object is the flat registry the driver's Verify/Bench
  * mains iterate.
  */
object SparkEntry {
  /** All registered operator demos, in module order. */
  def defs: Seq[QueryDef] =
    Relational.all ++ EventOps.all ++ GraphOps.all ++ TextOps.all ++
      SimilarityOps.all ++ MultimodalOps.all ++ ScaleOps.all ++
      CurationOps.all ++ graft.etl.CricketDemo.all ++
      graft.streaming.StreamingOps.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
