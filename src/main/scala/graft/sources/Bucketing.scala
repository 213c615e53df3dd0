package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout: the co-located-join counterpart to
  * `Layout.writeIndexed`'s partition pruning (SURVEY.md §2.A A4 — the
  * reference's secondary indexes, re-expressed as physical layout).
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join key fixes their physical partitioning in the table metadata, so
  * every subsequent equi-join on that key plans with NO exchange on
  * either side — at 100 TB this converts the nightly fact⋈fact join
  * from a full-table shuffle into a zip of co-located buckets. The
  * bucket count is a real tuning choice: it bounds per-task input at
  * read time (buckets ≈ table bytes / target split) and must match on
  * both sides for the co-located plan to apply.
  *
  * Verified by `BucketingSpec`: the bucketed⋈bucketed plan contains no
  * `Exchange`, the unbucketed equivalent does, and results are equal.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. `sortBy` the same
    * key keeps each bucket file key-clustered, which also enables
    * sort-merge joins without a per-task sort. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
