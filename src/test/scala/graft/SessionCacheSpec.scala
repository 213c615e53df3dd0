package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-(session, sfDir, key) checkpoint memoization that the shared
  * artifacts (shingle index, vocab counts, dedup labels, graph
  * projection) rely on for both speed and bounded executor storage.
  */
class SessionCacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("same key returns the SAME checkpointed frame without " +
      "re-evaluating the plan; different key or dir evaluates") {
    var builds = 0
    def plan = { builds += 1; Seq(1, 2, 3).toDF("x") }
    val a = SessionCache.checkpoint("scs-test", spark, "dirA")(plan)
    val b = SessionCache.checkpoint("scs-test", spark, "dirA")(plan)
    assert(a eq b, "second call must return the cached instance")
    assert(builds == 1, s"plan evaluated $builds times for one cache entry")
    val c = SessionCache.checkpoint("scs-test", spark, "dirB")(plan)
    assert(builds == 2 && !(c eq a), "different sfDir must build fresh")
    val d = SessionCache.checkpoint("scs-test-2", spark, "dirA")(plan)
    assert(builds == 3 && !(d eq a), "different key must build fresh")
    assert(a.collect().map(_.getInt(0)).sorted.sameElements(Array(1, 2, 3)))
  }

  test("cache materializes as a RELIABLE disk checkpoint — executor " +
      "memory stays flat across a many-query session") {
    val df = SessionCache.checkpoint("scs-disk", spark, "dirD")(
      Seq(1, 2, 3).toDF("x"))
    assert(df.collect().length == 3)
    val rdds = df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    assert(rdds.nonEmpty, "expected the cached frame to scan a pinned RDD")
    rdds.foreach { r =>
      assert(r.getCheckpointFile.isDefined,
        "expected a reliable (disk-file) checkpoint, not a local one")
      assert(!r.getStorageLevel.useMemory,
        s"cached artifact pins executor memory: ${r.getStorageLevel}")
    }
  }

  test("chained artifacts may build one cache entry from inside " +
      "another (reentrant lookup — no Recursive update)") {
    // many nested keys so some land in the same hash bin as the outer
    // entry — the exact condition that made computeIfAbsent throw
    val outer = SessionCache.checkpoint("scs-outer", spark, "dirR") {
      val inners = (0 until 32).map(i =>
        SessionCache.checkpoint(s"scs-inner-$i", spark, "dirR")(
          Seq(i).toDF("x")))
      inners.reduce(_ union _)
    }
    assert(outer.count() == 32)
    // and the inner entries are themselves cached
    val again = SessionCache.checkpoint("scs-inner-0", spark, "dirR")(
      fail("inner entry must be cached"))
    assert(again.collect().head.getInt(0) == 0)
  }
}
