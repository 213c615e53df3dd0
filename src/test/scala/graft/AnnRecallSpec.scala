package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured-recall pins for the two bucketed ANN paths — q35 (sign-LSH
  * buckets) and q44 (IVF, learned centroids, nprobe=2) — against
  * brute-force exact cosine top-5. The driver's oracle proves the
  * returned set is COMPUTED correctly; these pins prove the INDEX is
  * good: an ANN path whose recall silently collapses (bad hyperplanes,
  * degenerate centroids) still hash-matches its own oracle, so recall
  * must be pinned separately. Ground truth here is the spec's own
  * brute-force ranking (the q34 pin uses `embedNearPairsAllPairs` the
  * same way); cosine tie-order at the top-5 boundary can differ between
  * rankings, which the floor margins absorb.
  */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  /** exact cosine top-k neighbor ids per query, brute force. The dot is
    * the native codegen fold (bit-identical to the composable HOF form —
    * `FloatVectorDot`'s pinned contract — and ~100× faster, which is
    * what lets the pin run at the 20k-vector decade fixture). */
  private def truthTopK(sf: String, nq: Int, k: Int): Map[Long, Set[Long]] = {
    val dot = graft.functions.VectorFunctions.vecDot _
    val d = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nr"))
    val q = d.filter(col("vec_id") < nq)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nr").as("q_nr"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("neighbor"))
    d.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nr") * col("nr")))
          .as("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.map(_.getLong(1)).toSet }
  }

  private def annTopK(df: DataFrame): Map[Long, Set[Long]] =
    df.collect().groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.map(_.getLong(1)).toSet }

  private def meanRecall(ann: Map[Long, Set[Long]],
      truth: Map[Long, Set[Long]]): Double = {
    val per = truth.map { case (qid, t) =>
      ann.getOrElse(qid, Set.empty).count(t.contains).toDouble / t.size }
    per.sum / per.size
  }

  for ((name, nq, floor) <- Seq(
      ("q35_ann_lsh_bucketed", 20, 0.55),
      ("q44_ann_ivf", 5, 0.70))) {
    test(s"$name recall@5 vs brute-force exact cosine stays above $floor " +
        "at sf0.001 and sf0.01") {
      for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
        val truth = truthTopK(sf, nq, 5)
        val ann = annTopK(SparkEntry.queries(name)(spark, sf))
        val r = meanRecall(ann, truth)
        info(f"$name recall@5 at $sf: $r%.3f")
        assert(r >= floor, f"$name recall@5 $r%.3f below floor $floor ($sf)")
      }
    }

    test(s"$name recall@5 holds at the 20k-vector decade fixture " +
        "(sf1 scale: buckets saturated, q34's knee crossed)") {
      // 10× sf0.01 with the orthogonal per-replica diagonal — the same
      // construction (and the same 20k size) as the sf1 decade corpus,
      // so bucket occupancy and cell population match what BENCH_sf1
      // exercises rather than the near-empty driver-sf index.
      val dir = TestEmbeddingFixtures.scaled(spark, "/root/testdata/sf0.01", 10)
      val truth = truthTopK(dir, nq, 5)
      val ann = annTopK(SparkEntry.queries(name)(spark, dir))
      val r = meanRecall(ann, truth)
      info(f"$name recall@5 at 20k fixture: $r%.3f")
      assert(r >= floor, f"$name recall@5 $r%.3f below floor $floor (20k)")
    }
  }
}
