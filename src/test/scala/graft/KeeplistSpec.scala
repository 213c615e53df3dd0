package graft

import org.scalatest.funsuite.AnyFunSuite

/** q63's keep-list against q49's cluster summary and the keep-longest
  * policy, on the same (session-cached) labels.
  */
class KeeplistSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  test("keep-list covers exactly the clustered docs, keeps exactly one " +
      "per cluster, and the keeper is the longest member (ties by id)") {
    val keep = SparkEntry.queries("q63_dedup_keeplist")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    val clusters = SparkEntry.queries("q49_dedup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keep.nonEmpty && clusters.nonEmpty, "degenerate fixture")

    // row set == clustered docs: per-cluster row counts match q49
    val byCluster = keep.groupBy(_._1)
    assert(byCluster.keySet == clusters.keySet)
    byCluster.foreach { case (c, rows) =>
      assert(rows.length.toLong == clusters(c),
        s"cluster $c: ${rows.length} keep-list rows vs ${clusters(c)} members")
      val kept = rows.filter(_._4 == 1)
      assert(kept.length == 1, s"cluster $c keeps ${kept.length} docs")
      // keep-longest policy, ties by doc_id
      val best = rows.minBy(r => (-r._3, r._2))
      assert(kept.head._2 == best._2,
        s"cluster $c kept ${kept.head._2}, expected ${best._2}")
    }

    // every cluster sheds at least ... nothing to shed only if singleton;
    // q49 clusters come from pairs, so every cluster has >= 2 members
    // and the keep-list drops >= 1 doc per cluster
    byCluster.foreach { case (c, rows) =>
      assert(rows.count(_._4 == 0) >= 1, s"cluster $c drops nothing")
    }
  }
}
