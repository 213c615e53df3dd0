package graft

import org.apache.spark.sql.SparkSession

/** Dev measurement loop for q34's banded-LSH recall claim:
  * `tools/run.sh graft.RecallProbe <sfDir...>` prints banded vs exact
  * all-pairs counts and the recall at each scale factor. The sf0.001 and
  * sf0.01 figures are pinned >= 0.9 by `SimilaritySpec`; this main is how
  * the larger-sf numbers quoted in the q34 scaladoc were measured (the
  * all-pairs verifier is O(N^2/2) — a measurement tool, never a query).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { sf =>
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (banded, tBanded) = timed(
        SparkEntry.queries("q34_embed_near_pairs")(spark, sf)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      val (exact, tExact) = timed(
        graft.operators.SimilarityOps
          .embedNearPairsAllPairs(spark, sf)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      val miss = exact.size - (banded & exact).size
      println(f"$sf: banded=${banded.size} (${tBanded}%.1fs) " +
        f"exact=${exact.size} (${tExact}%.1fs) " +
        f"missed=$miss recall=${(exact.size - miss).toDouble / exact.size}%.4f")
    }
    spark.stop()
  }
}
