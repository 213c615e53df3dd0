package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityOps

/** q34's banded sign-LSH candidate generation, measured against the
  * retired all-pairs exactness verifier (small-sf only — the all-pairs
  * form is O(N²/2) by construction and exists precisely for this
  * comparison; see SimilarityOps.embedNearPairsAllPairs).
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  test("q34 banded pairs are a subset of the exact all-pairs result " +
      "with recall >= 0.9 at sf0.001 and sf0.01, cosines bit-exact") {
    def keyed(rows: Array[org.apache.spark.sql.Row]): Map[(Long, Long), Double] =
      rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val banded = keyed(
        SparkEntry.queries("q34_embed_near_pairs")(spark, sf).collect())
      val exact = keyed(SimilarityOps.embedNearPairsAllPairs(spark, sf).collect())
      // no false positives: every banded pair is a true >= 0.4 pair with
      // the identical (same fold, same doubles) cosine
      banded.foreach { case (k, cos) =>
        assert(exact.contains(k), s"banded pair $k not in exact all-pairs ($sf)")
        assert(exact(k) == cos, s"cosine mismatch for $k ($sf)")
      }
      val recall = banded.size.toDouble / exact.size
      info(f"banded recall at $sf: ${banded.size}/${exact.size} = $recall%.3f")
      // 12 bands × 3 bits: expected recall 1-(1-p³)^12 ≈ 0.97 at the
      // cosine-0.4 threshold (p ≈ 0.63); pinned with margin at 0.9
      assert(recall >= 0.9, f"banded recall $recall%.3f below the 0.9 floor ($sf)")
    }
  }

  test("q34 per-cell tier (above the knee): subset of the exhaustive " +
      "product with recall >= 0.9, cosines bit-exact") {
    def keyed(rows: Array[org.apache.spark.sql.Row]): Map[(Long, Long), Double] =
      rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // 10× sf0.001 with the orthogonal per-replica diagonal = 5,000
    // vectors, above PairExactKnee — the registered q34 takes the
    // per-cell branch here (same gate the driver sfs never cross)
    val dir = TestEmbeddingFixtures.scaled(spark, "/root/testdata/sf0.001", 10)
    val perCell = keyed(
      SparkEntry.queries("q34_embed_near_pairs")(spark, dir).collect())
    val exact = keyed(
      SimilarityOps.embedNearPairsAllPairs(spark, dir).collect())
    perCell.foreach { case (k, cos) =>
      assert(exact.contains(k), s"per-cell pair $k not in exhaustive product")
      assert(exact(k) == cos, s"cosine mismatch for $k")
    }
    val recall = perCell.size.toDouble / exact.size
    info(f"per-cell recall: ${perCell.size}/${exact.size} = $recall%.3f")
    assert(recall >= 0.9, f"per-cell recall $recall%.3f below the 0.9 floor")
  }

  test("q34 per-cell tier in the SCALED-k regime (30k vectors, " +
      "k = 191 > the 128 floor): subset + recall floor holds as the " +
      "cell count grows with the corpus") {
    // 15× sf0.1 = 30,000 vectors — past the k = max(128, n/157) floor,
    // so this pins the k ∝ n regime with the QUANTIZER-COUNT ladder
    // (q = 7 at k = 191, fixed nprobe 4): round 10's fixed (np=4, q=4)
    // measured 0.904 here and DECAYED with k (0.804 @ 60k, 0.585 @
    // 200k); round 11 held the floor by √k-scaled probe width at n^1.5
    // candidate volume; the round-12 ladder compounds INDEPENDENT
    // quantizers instead (measured 1−(1−r1)^q to ±0.006), reaching the
    // same floor at ~0.65× the volume. The 0.85 floor pins the
    // no-decay contract — a regression back to a fixed quantizer count
    // (or a broken ladder) fails it
    val dir = TestEmbeddingFixtures.scaled(spark, "/root/testdata/sf0.1", 15)
    assert(graft.operators.SimilarityOps.pairCells(30000) == 191)
    assert(graft.operators.SimilarityOps.pairQuantizersScaled(191) == 7)
    assert(graft.operators.SimilarityOps.pairQuantizersScaled(128) == 6)
    assert(graft.operators.SimilarityOps.pairQuantizersScaled(1273) == 17)
    assert(graft.operators.SimilarityOps.pairQuantizersScaled(6000) == 32)
    def keyed(rows: Array[org.apache.spark.sql.Row]): Map[(Long, Long), Double] =
      rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val perCell = keyed(
      SparkEntry.queries("q34_embed_near_pairs")(spark, dir).collect())
    val exact = keyed(
      SimilarityOps.embedNearPairsAllPairs(spark, dir).collect())
    perCell.foreach { case (k, cos) =>
      assert(exact.contains(k), s"per-cell pair $k not in exhaustive product")
      assert(exact(k) == cos, s"cosine mismatch for $k")
    }
    val recall = perCell.size.toDouble / exact.size
    info(f"scaled-k recall at 30k: ${perCell.size}/${exact.size} = $recall%.3f")
    assert(recall >= 0.85,
      f"scaled-k per-cell recall $recall%.3f below the 0.85 floor")
  }

  test("q126 streaming ANN ingest replays the corpus as multiple " +
      "micro-batches and its drained audit equals q123's batch form " +
      "row-for-row (batch-boundary independence)") {
    val sf = "/root/testdata/sf0.001"
    graft.streaming.StreamingOps.pollDrainStats() // clear prior entries
    val streamed = SparkEntry.queries("q126_stream_ann_ingest")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q123_index_maintenance")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "streamed rollup diverges from the batch audit")
    val drains = graft.streaming.StreamingOps.pollDrainStats()
      .filter(_._1 == "q126_stream_ann_ingest")
    assert(drains.nonEmpty, "q126 did not record its drain telemetry")
    // 4 staged files + the no-data finalization batch the engine may add
    assert(drains.head._2 >= 4,
      s"expected >= 4 micro-batches, saw ${drains.head._2}")
  }
}
