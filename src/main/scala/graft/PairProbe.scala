package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev cost probe for the exact-pair family (q27/q55), the RecallProbe
  * counterpart for CANDIDATE VOLUME: prints the pair-volume gate
  * statistic, the prefix-filter candidate counts (pre- and post-dedup),
  * and per-phase wall times, so a decade sweep attributes superlinear
  * growth to a phase instead of a guess.
  * Usage: `tools/run.sh graft.PairProbe <sfDir>`.
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.buffer.pageSize", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.operators.TextOps
    val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
    println(s"[probe] docs=$nDocs")
    val pv = timed("pairVolume stat")(TextOps.pairVolume(spark, d))
    println(s"[probe] pairVolume=$pv")
    timed("rankedIndex build")(
      TextOps.rankedIndexProbe(spark, d).count(): Unit)
    val pre = timed("prefix cand (pre-dedup)")(
      TextOps.prefixCandidatesProbe(spark, d).count())
    println(s"[probe] prefix_cand_rows=$pre")
    val dis = timed("prefix cand distinct")(
      TextOps.prefixCandidatesProbe(spark, d).distinct().count())
    println(s"[probe] prefix_cand_distinct=$dis")
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def gcMs(): Long = ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
    val runs = if (args.length > 1) args(1).toInt else 2
    for (i <- 1 to runs) {
      val g0 = gcMs()
      timed(s"q27 full (run $i)")(
        SparkEntry.queries("q27_jaccard_pairs")(spark, d)
          .write.format("noop").mode("overwrite").save())
      System.gc(); Thread.sleep(300)
      val rt = Runtime.getRuntime
      println(s"[probe]   gc_in_run=${gcMs() - g0}ms " +
        s"heap=${(rt.totalMemory - rt.freeMemory) >> 20}M " +
        s"meta=${ManagementFactory.getMemoryPoolMXBeans.asScala
          .filter(_.getName.endsWith("Metaspace"))
          .map(_.getUsage.getUsed >> 20).sum}M " +
        s"classes=${ManagementFactory.getClassLoadingMXBean.getLoadedClassCount}")
    }
    spark.stop()
  }
}
