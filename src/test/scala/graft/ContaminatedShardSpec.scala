package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** q138 contamination-aware shard manifest: the layout columns must be
  * CONSISTENT with q133's manifest (same shard set, same per-shard
  * sequence-derived token mass — q138 aggregates docs, q133 aggregates
  * sequences, over the same packing), the contaminated doc set must be
  * exactly q84's output, and the contaminated mass must be conserved
  * (Σ per-shard contaminated_tokens = Σ n_tok over q84's docs).
  */
class ContaminatedShardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  private val sf = "/root/testdata/sf0.01"

  private lazy val q138 =
    SparkEntry.queries("q138_contaminated_shards")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("shard set and token mass agree with q133's manifest") {
    val q133 = SparkEntry.queries("q133_shard_manifest")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(q138.map(_._1).toSet == q133.keySet)
    q138.foreach { case (shard, _, _, tokens, _, _) =>
      assert(q133(shard) == tokens,
        s"shard $shard: q138 mass $tokens != q133 ${q133(shard)}")
    }
  }

  test("contaminated docs are exactly q84's output; mass and ppm " +
      "conserve") {
    import org.apache.spark.sql.functions._
    val cont = SparkEntry.queries("q84_bloom_decontaminate")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val docTok = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(trim(col("text")), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val contMass = cont.toSeq.map(docTok).sum
    assert(q138.map(_._5).sum == contMass,
      "per-shard contaminated token mass does not sum to q84's docs")
    assert(q138.map(_._2).sum == docTok.size.toLong)
    assert(q138.map(_._3).sum == cont.size.toLong)
    q138.foreach { case (shard, _, _, tokens, cTok, ppm) =>
      assert(ppm == cTok * 1000000L / tokens, s"ppm mismatch at $shard")
    }
  }
}
