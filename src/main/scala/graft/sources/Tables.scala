package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver's star-schema testdata
  * (`TESTDATA.md`). Mirrors the reference's source scans
  * (`/root/reference/neo4j_loader.py:82,96-99` — server-side projected
  * `find()`): here projection/pruning is left to Catalyst's
  * `ColumnPruning`, which pushes the needed columns into the parquet
  * vectorized reader automatically.
  *
  * Scale posture: each loader is a plain file-source scan — at 100 TB the
  * same call reads a partitioned directory tree and Catalyst prunes both
  * columns (ReadSchema) and files (partition/row-group stats). No schema
  * inference cost: parquet footers carry the schema.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** The events table's `ts` has carried two physical encodings across
    * driver testdata generations: INT64 nanosecond epochs and native
    * microsecond TIMESTAMP. Probe the footer schema and surface a
    * microsecond TIMESTAMP_NTZ `ts` either way — timezone-naive end to
    * end, so results compare exactly with engines that read the same
    * file natively (DuckDB truncates ns→us the same way integer
    * division does; the session timezone is pinned UTC so LTZ↔NTZ
    * casts are µs-exact).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = table(s, d, "events")
    val ts =
      if (raw.schema("ts").dataType == LongType)
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      else col("ts").cast("timestamp_ntz")
    raw.withColumn("ts", ts)
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
