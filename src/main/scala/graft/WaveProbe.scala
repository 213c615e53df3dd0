package graft

import org.apache.spark.sql.SparkSession

/** Dev A/B harness for the disk-bounded wave tier's WAVE-COUNT
  * objective (q27/q55 staging): same tree, same session, back-to-back
  * stagings of one family at forced wave counts, each from a cleared
  * staged dir, printing the staging wall + result rows. Exists because
  * round 12's model-planned 7-wave q55 staging (1487.7 s) measured
  * SLOWER than round 10's 10 hand-tuned waves (1254.3 s) on different
  * days — an unattributed 1.19× that is either "fewer, bigger waves
  * are more spill-bound" (model objective wrong: it minimizes wave
  * count under the disk bound) or documented host phase noise. A
  * same-session A/B discriminates. Usage:
  * `tools/run.sh graft.WaveProbe <sfDir> <jaccard|containment> <w1,w2,…>`
  * A measurement tool, never a query.
  */
object WaveProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val family = args(1)
    val waves = args(2).split(",").map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.buffer.pageSize", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import java.nio.file.{Files, Paths}
    // clearing the staged artifact forces a full restage so each A/B
    // leg pays the whole staging cost; the location is resolved through
    // TextOps.stagedArtifactDir — the same code stagedPairScan uses —
    // so a key-scheme change there can never leave this probe deleting
    // a stale path and measuring warm restages
    def clearStaged(): Unit =
      graft.Fs.rmTree(graft.operators.TextOps.stagedArtifactDir(d, family))
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def gcMs(): Long = ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
    waves.foreach { w =>
      clearStaged()
      val free0 = new java.io.File(sys.props("java.io.tmpdir"))
        .getUsableSpace / 1e9
      val g0 = gcMs()
      val t0 = System.nanoTime()
      val rows = (family match {
        case "containment" =>
          graft.operators.TextOps.containmentStagedPath(spark, d, w)
        case "jaccard" =>
          graft.operators.TextOps.jaccardStagedPath(spark, d, w)
        case other =>
          sys.error(s"unknown family '$other' (jaccard|containment)")
      }).count()
      println(f"[waveprobe] $family waves=$w " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s rows=$rows " +
        f"gc=${gcMs() - g0}ms free_start=$free0%.1f GB")
    }
    spark.stop()
    System.exit(0)
  }
}
