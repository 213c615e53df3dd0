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

  /** Morton (Z-order) key of two non-negative 32-bit column values: bit
    * interleave via the classic parallel-prefix spread — pure built-in
    * bitwise/shift expressions, so the whole key stays inside whole-
    * stage codegen (no custom Expression needed; composition rung (a)
    * of the §2.I ladder). Clustering files by this key gives every file
    * a tight RECTANGLE in (a, b) space, so parquet row-group min/max
    * stats prune scans filtered on EITHER dimension — the multi-
    * dimensional data-skipping layout (Delta/Iceberg `ZORDER BY`) that
    * single-column sorting cannot provide: lexicographic (a, b) order
    * prunes `a`-predicates only, leaving every file's `b` range
    * full-width. */
  def zorderKey(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def spread(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      // 32 bits spread to the even positions of 64 (values < 2^32)
      val masks = Seq(
        (16, 0x0000FFFF0000FFFFL), (8, 0x00FF00FF00FF00FFL),
        (4, 0x0F0F0F0F0F0F0F0FL), (2, 0x3333333333333333L),
        (1, 0x5555555555555555L))
      masks.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
        case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
      }
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Write `df` clustered by the Z-order key of (c1, c2) into `n`
    * range-partitioned files, rows sorted by the key within each file.
    * Each column is min/max-normalized to 16 bits BEFORE interleaving —
    * without normalization a narrow column (say 0..9 next to 0..2M)
    * contributes only low-order bits and the "Z-order" degenerates to a
    * single-column sort on the wide one; production ZORDER does the
    * same with range-ids. The stats pass is one tiny aggregate. At
    * 100 TB the same two jobs run per partition/day; the payoff is that
    * a scan with a selective predicate on EITHER clustered column skips
    * the row groups whose (min, max) rectangle misses it. */
  def writeZOrdered(df: DataFrame, outDir: String, n: Int,
      c1: String, c2: String): Unit = {
    val mm = df.agg(
      min(col(c1)).cast("long"), max(col(c1)).cast("long"),
      min(col(c2)).cast("long"), max(col(c2)).cast("long")).head()
    def norm(c: String, lo: Long, hi: Long) =
      if (hi > lo) (col(c).cast("long") - lo) * 65535L / (hi - lo)
      else lit(0L)
    val z = zorderKey(norm(c1, mm.getLong(0), mm.getLong(1)),
      norm(c2, mm.getLong(2), mm.getLong(3)))
    df.repartitionByRange(n, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Rows the scan node emits AFTER parquet row-group stat skipping
    * (before any post-scan filter) — the evidence metric for data
    * skipping, at row-group granularity where [[filesRead]] counts
    * directory pruning. */
  def rowsScanned(spark: SparkSession, dir: String,
      filterExpr: String): Long = {
    val df = spark.read.parquet(dir).filter(expr(filterExpr))
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    scan.map(_.metrics("numOutputRows").value).getOrElse(-1L)
  }
}
