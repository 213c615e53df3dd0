package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement tool for the q129 scale claim (VERDICT r14 item 3): the
  * streamed-index pair JOIN TERM — Σ_cells δ(c)·pop(c) — measured on
  * q129's own join shape under the k∝n `pairCells` geometry its
  * scaladoc cites, instead of inheriting the linearity claim from
  * q34/q102. For each requested cell mode this runs the cold batch
  * assignment into k learned cells (NOT the measured term; materialized
  * via localCheckpoint so the timed join reads a settled artifact, like
  * the registered path reading the streamed parquet), computes the
  * EXACT candidate volume from the assignment histogram
  * (Σ δ(c)·(pop(c)−1), the join's row count before the cosine filter),
  * then times the registered pair join (`SimilarityOps.probePairJoin`
  * == the exact `withinCellDeltaPairs` q129 runs) twice back-to-back
  * (adjacent best-of-2, the bench convention) with gc-in-run diag.
  *
  * Expected shape: under k = pairCells(n) (k ∝ n), per-cell population
  * is ~constant, so candidates grow LINEARLY in n (per-delta-vector
  * volume flat) where the fixed-16 demo geometry grows quadratically.
  *
  * Usage: `tools/run.sh graft.StreamIndexProbe <sfDir> <mode1,mode2,…>`
  * where each mode is `contract` (k = pairCells(n)) or an integer k,
  * optionally suffixed `-hier` (route the BUILD through the two-level
  * assignment — [[graft.operators.SimilarityOps.probeAssignmentHier]],
  * the deployment form whose build term this probe exists to measure;
  * `-hierw<W>` overrides the super-probe width). Hier modes also
  * compute the end pair recall vs the flat build of the same k
  * (untimed), so the escape's accuracy price sits in the same JSON as
  * its cost. Prints one JSON line per mode plus sentinel lines
  * ([[PhaseSentinel]]). A measurement tool, never a query.
  */
object StreamIndexProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val modes = if (args.length > 1) args(1).split(",").toSeq
                else Seq("contract", "16")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.buffer.pageSize", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def gcMs(): Long = ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
    val n = spark.read.parquet(s"$d/embeddings.parquet").count()
    println(s"""{"sentinel_pre":${PhaseSentinel.json(cpus.toInt)}}""")
    // exact delta-pair ground truth, shared by every mode (untimed):
    // both tiers are approximate indexes, so each is scored against
    // truth — recall-vs-flat alone would punish disagreement
    lazy val truth = graft.operators.SimilarityOps
      .probeDeltaTruth(spark, d).localCheckpoint()
    lazy val truthN = truth.count()
    modes.foreach { mode =>
      val hier = mode.contains("-hier")
      val w = "-hierw(\\d+)".r.findFirstMatchIn(mode)
        .map(_.group(1).toInt).getOrElse(0)
      val k = mode.split("-")(0) match {
        case "contract" => graft.operators.SimilarityOps.pairCells(n)
        case x          => x.toInt
      }
      val tb0 = System.nanoTime()
      val asn = (if (hier)
          graft.operators.SimilarityOps.probeAssignmentHier(spark, d, k, w)
        else graft.operators.SimilarityOps.probeAssignment(spark, d, k))
        .localCheckpoint()
      val buildS = (System.nanoTime() - tb0) / 1e9
      // exact candidate volume from the assignment histogram: the join
      // emits δ(c)·pop(c) − δ(c) rows per cell (self-matches filtered)
      val hist = asn
        .groupBy(col("c_id"))
        .agg(count(lit(1)).as("pop"),
          sum(when(col("vec_id") % 13 === 5, 1L).otherwise(0L)).as("delta"))
        .agg(sum(col("delta") * (col("pop") - 1)).as("cand"),
          sum(col("delta")).as("n_delta"),
          max(col("pop")).as("max_pop"),
          count(lit(1)).as("n_cells"))
        .collect()(0)
      val (cand, nDelta, maxPop, nCells) =
        (hist.getLong(0), hist.getLong(1), hist.getLong(2), hist.getLong(3))
      def once(): (Double, Long, Long) = {
        val g0 = gcMs()
        val t0 = System.nanoTime()
        val pairs = graft.operators.SimilarityOps
          .probePairJoin(spark, asn).count()
        ((System.nanoTime() - t0) / 1e9, pairs, gcMs() - g0)
      }
      val (s1, p1, g1) = once()
      System.gc(); Thread.sleep(200)
      val (s2, p2, g2) = once()
      require(p1 == p2, s"nondeterministic pair count: $p1 vs $p2")
      val joinS = math.min(s1, s2)
      // accuracy context for the build-term decade point (untimed):
      // every mode's emitted pairs scored against the exact delta-pair
      // ground truth; hier additionally vs the flat build of the same k
      val modePairs = graft.operators.SimilarityOps.probePairJoin(spark, asn)
        .select(col("v1"), col("v2")).localCheckpoint()
      val truthHits = modePairs
        .join(truth, Seq("v1", "v2"), "left_semi").count()
      val truthStr = s""","truth_pairs":$truthN,""" +
        s""""recall_vs_truth":${f"${truthHits.toDouble / truthN}%.4f"}"""
      val recall =
        if (!hier) s""","tier":"flat"$truthStr"""
        else {
          val flatPairs = graft.operators.SimilarityOps
            .probePairJoin(spark,
              graft.operators.SimilarityOps.probeAssignment(spark, d, k)
                .localCheckpoint())
            .select(col("v1"), col("v2")).localCheckpoint()
          val nf = flatPairs.count()
          val inter = modePairs
            .join(flatPairs, Seq("v1", "v2"), "left_semi").count()
          s""","tier":"hier","w_mode":${if (w > 0) w else -1},""" +
            s""""flat_pairs":$nf,""" +
            s""""pair_recall_vs_flat":${f"${inter.toDouble / nf}%.4f"}""" +
            truthStr
        }
      println(
        s"""{"probe":"stream_index_pairs","sf":"$d","n_vec":$n,""" +
          s""""mode":"$mode","k":$k,"n_cells":$nCells,"max_pop":$maxPop,""" +
          s""""n_delta":$nDelta,"candidates":$cand,"pairs_ge_04":$p1,""" +
          s""""build_s":${f"$buildS%.2f"},"join_s":${f"$joinS%.2f"},""" +
          s""""join_s_p1":${f"$s1%.2f"},"join_s_p2":${f"$s2%.2f"},""" +
          s""""gc_ms_p1":$g1,"gc_ms_p2":$g2$recall}""")
      asn.unpersist(): Unit
    }
    println(s"""{"sentinel_post":${PhaseSentinel.json(cpus.toInt)}}""")
    spark.stop()
  }
}
