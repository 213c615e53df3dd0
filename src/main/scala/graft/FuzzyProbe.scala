package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev phase-timer for q48's fuzzy-match pipeline:
  * `tools/run.sh graft.FuzzyProbe <sfDir>` times each stage in isolation
  * (variant build, hashed candidate join, dedup, name attach + verify)
  * and prints the row volumes, so a wall-clock regression is
  * attributable to a specific stage before touching the plan. A
  * measurement tool, never a query.
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.buffer.pageSize", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args(0)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fuzzy] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val name = col("c_name")
    val variants = concat(
      array(name),
      transform(sequence(lit(1), length(name)),
        i => concat(name.substr(lit(1), i - lit(1)),
          name.substr(i + lit(1), length(name)))))
    val cust = graft.sources.Tables.customer(spark, d)
      .select(col("c_custkey"), name)
    val v = cust
      .repartition(spark.sparkContext.defaultParallelism, col("c_custkey"))
      .select(col("c_custkey"), explode(array_distinct(variants)).as("var"))
      .select(col("c_custkey"), xxhash64(col("var")).as("h"))
    val nV = timed("variants")(v.count())
    val a = v.select(col("c_custkey").as("k1"), col("h"))
    val b = v.select(col("c_custkey").as("k2"), col("h"))
    val cand = a.join(b, Seq("h")).filter(col("k1") < col("k2"))
      .select(col("k1"), col("k2"))
    val nC = timed("candidates")(cand.count())
    val nD = timed("cand_distinct")(cand.distinct().count())
    val full = timed("full_query")(
      SparkEntry.queries("q48_fuzzy_match")(spark, d).count())
    println(s"[fuzzy] rows variants=$nV candidates=$nC distinct=$nD out=$full")
    spark.stop()
    System.exit(0)
  }
}
