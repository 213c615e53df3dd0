package graft

import org.apache.spark.sql.SparkSession

/** Stage-timing driver for q35 (sign-LSH ANN) — prints one JSON line of
  * per-stage warm walls (two passes, second reported) attributing the
  * query's wall to index build vs candidate join+distinct vs re-rank. */
object Q35Probe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.buffer.pageSize", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"""{"sentinel_pre":${PhaseSentinel.json(cpus.toInt)}}""")
    graft.operators.SimilarityOps.q35StageProbe(spark, sf): Unit
    val warm = graft.operators.SimilarityOps.q35StageProbe(spark, sf)
    val fields = warm.map { case (k, v) => s""""$k":${f"$v%.2f"}""" }
    println(s"""{"probe":"q35_stages","sf":"$sf",${fields.mkString(",")},""" +
      s""""sentinel_post":${PhaseSentinel.json(cpus.toInt)}}""")
    spark.stop()
    System.exit(0)
  }
}
