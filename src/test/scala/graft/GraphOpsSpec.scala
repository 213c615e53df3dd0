package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("pageRank matches hand-computed golden on a fixed 4-node graph") {
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "a"), ("d", "c"), ("a", "c"))
      .toDF("src", "dst")
    val got = GraphOps.pageRank(edges, iters = 10, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // reference values: 10 iterations of rank = (1-d)/N + d * sum(in/out),
    // no dangling redistribution, computed independently.
    val expected = Map(
      "a" -> 0.3750543823, "b" -> 0.1949370588,
      "c" -> 0.3925085589, "d" -> 0.0375)
    assert(got.keySet == expected.keySet)
    expected.foreach { case (n, v) =>
      assert(math.abs(got(n) - v) < 1e-8, s"node $n: ${got(n)} vs $v")
    }
  }

  test("pageRank ranks are positive and sum below 1 (dangling leak)") {
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c")).toDF("src", "dst")
    val ranks = GraphOps.pageRank(edges, iters = 5)
      .collect().map(_.getDouble(1))
    assert(ranks.forall(_ > 0))
    assert(ranks.sum <= 1.0 + 1e-9)
  }

  test("reliable checkpointing produces identical ranks to localCheckpoint") {
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "a"), ("d", "c"), ("a", "c"))
      .toDF("src", "dst")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    try {
      val local = GraphOps.pageRank(edges, iters = 7)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val checkpointDirBefore = spark.sparkContext.getCheckpointDir
      val reliable = GraphOps.pageRank(edges, iters = 7,
          checkpointDir = Some(dir))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      // setCheckpointDir is session-global: the call must restore the
      // caller's value rather than leak its own
      assert(spark.sparkContext.getCheckpointDir == checkpointDirBefore)
      assert(local.keySet == reliable.keySet)
      local.foreach { case (n, v) =>
        assert(java.lang.Double.doubleToLongBits(reliable(n)) ==
          java.lang.Double.doubleToLongBits(v), s"node $n differs")
      }
    } finally {
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
      ()
    }
  }

  test("nodes builder dedups endpoints") {
    val edges = Seq(("a", "b"), ("a", "b"), ("b", "c")).toDF("src", "dst")
    val ns = GraphOps.nodes(edges).collect().map(_.getString(0)).sorted
    assert(ns.toSeq == Seq("a", "b", "c"))
  }
}
