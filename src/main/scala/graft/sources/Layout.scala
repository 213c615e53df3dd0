package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators — the Spark equivalent of the reference's
  * six secondary indexes (`etl_cricsheet_to_mongo.py:121-126`, SURVEY.md
  * §2.A A4). Spark has no secondary indexes; the same scan acceleration
  * comes from layout:
  *
  *  - **Partitioned directories** on a filter column → partition pruning
  *    (the scan never opens non-matching directories) — the analogue of
  *    the (match_type, team_type) index.
  *  - **Sort within files** on a range/point column → parquet row-group
  *    min/max stats skip non-matching row groups — the analogue of the
  *    batter/bowler/date indexes.
  *
  * At 100 TB this is the difference between reading a shard and reading
  * the fleet; at local scale the tests assert pruning happens (files
  * actually skipped), not that it is faster.
  */
object Layout {

  /** Write `df` partitioned by `partCol` and sorted by `sortCols` within
    * each file — the "indexed" layout for predicates on those columns.
    */
  def writeIndexed(df: DataFrame, outDir: String, partCol: String,
      sortCols: String*): Unit =
    df.repartition(col(partCol))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write
      .partitionBy(partCol)
      .mode("overwrite")
      .parquet(outDir)

  /** Number of files a filtered scan of `dir` actually reads — evidence
    * that partition pruning worked. */
  def filesRead(spark: SparkSession, dir: String, filterExpr: String): Long = {
    val df = spark.read.parquet(dir).filter(expr(filterExpr))
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    scan.map(_.selectedPartitions.totalNumberOfFiles).getOrElse(-1L)
  }
}
