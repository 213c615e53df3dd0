package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** q133's shard layout: the blocked cross-source prefix must be
  * bit-identical at every block size (including degenerate ones), and
  * the manifest must satisfy the invariants a dataloader relies on —
  * token conservation, dense shard ids, global (source, seq_id)
  * continuity across consecutive shards, and sequence-count agreement
  * with q58's bin relation.
  */
class ShardManifestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private val sf = "/root/testdata/sf0.01"

  test("shard manifest is block-size independent") {
    val ref = TextOps.shardManifestPlan(spark, sf, TextOps.PackBlockDocs)
      .collect().map(_.toSeq).toSeq
    assert(ref.nonEmpty)
    for (b <- Seq(1L, 7L, 1000000L)) {
      val alt = TextOps.shardManifestPlan(spark, sf, b)
        .collect().map(_.toSeq).toSeq
      assert(alt == ref, s"shard layout diverges at blockDocs=$b")
    }
  }

  test("blocked prefix is depth-independent: levels=3 (the registered " +
      "global-pass shape) == levels=2 == the plain window, at a block " +
      "size small enough that the third level is non-degenerate") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = TextOps.packSequencesPlan(spark, sf, TextOps.PackBlockDocs)
      .select(col("source"), col("seq_id").cast("long").as("doc_id"),
        col("seq_tokens").as("n_tok"))
    // blockDocs=4 on ~hundreds of bins: level-2 block totals are >4 rows
    // per source, so the recursion genuinely re-blocks them
    val l2 = TextOps.packOffsetsFrom(docs, 4L, levels = 2)
      .collect().map(_.toSeq).sortBy(_.toString)
    val l3 = TextOps.packOffsetsFrom(docs, 4L, levels = 3)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(l2.nonEmpty && l2.toSeq == l3.toSeq)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs
      .withColumn("off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(l3.toSeq == naive.toSeq)
  }

  test("manifest invariants: token conservation, dense shard ids, " +
      "cross-shard (source, seq_id) continuity, bin-count agreement " +
      "with q58") {
    val rows = SparkEntry.queries("q133_shard_manifest")(spark, sf).collect()
    val bins = TextOps.packSequencesPlan(spark, sf, TextOps.PackBlockDocs)
      .collect()
    // token conservation: shard tokens sum to the corpus bin tokens
    assert(rows.map(_.getLong(2)).sum ==
      bins.map(r => r.getLong(3)).sum)
    // every sequence lands in exactly one shard
    assert(rows.map(_.getLong(1)).sum == bins.length.toLong)
    // shard ids dense from 0 (every 16,384-token span holds >= 1
    // sequence start because sequences are at most 256 tokens apart)
    assert(rows.map(_.getLong(0)).toSeq == rows.indices.map(_.toLong))
    // consecutive shards: shard k's last (source, seq_id) precedes
    // shard k+1's first in global order
    rows.sliding(2).foreach { pair =>
      if (pair.length == 2) {
        val last = (pair(0).getString(6), pair(0).getInt(7))
        val first = (pair(1).getString(4), pair(1).getInt(5))
        assert(Ordering.Tuple2[String, Int].lt(last, first),
          s"shards overlap in global order: $last !< $first")
      }
    }
    // non-final shards are filled: a new sequence starts within 256
    // tokens, so a shard's token mass can undershoot its 16,384 budget
    // only by less than one sequence and overshoot only by the spill
    // of its last sequence
    rows.dropRight(1).foreach { r =>
      assert(r.getLong(2) > 16384L - 256L,
        s"non-final shard ${r.getLong(0)} underfilled: ${r.getLong(2)}")
    }
  }
}
