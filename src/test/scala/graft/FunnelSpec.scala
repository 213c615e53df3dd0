package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  /** join formulation of the funnel — the oracle's algebra, in Spark. */
  private def joinFunnel(rows: Seq[(Long, Int, Long)], w: Long) = {
    val df = rows.toDF("user_id", "rank", "us")
    val v = df.filter($"rank" === 0).select($"user_id", $"us".as("vus"))
    val c = df.filter($"rank" === 1).select($"user_id", $"us".as("cus"))
    val p = df.filter($"rank" === 2).select($"user_id", $"us".as("pus"))
    p.join(c, "user_id").filter($"cus" <= $"pus")
      .join(v, "user_id").filter($"vus" <= $"cus" && $"pus" <= $"vus" + w)
      .groupBy($"user_id").agg(min($"pus").as("purchase_us"))
  }

  test("automaton equals the 3-way join on adversarial random streams") {
    val rnd = new scala.util.Random(13)
    // dense ts range with many exact ties to stress the v<=c<=p order
    val rows = Seq.tabulate(4000)(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(3), rnd.nextInt(40).toLong))
    val w = 10L
    val got = EventOps.funnelConverted(
      rows.toDF("user_id", "rank", "us").as[(Long, Int, Long)], w)(spark)
    val want = joinFunnel(rows, w)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("boundary: conversion exactly at the window edge counts, +1us does not") {
    def run(pUs: Long) = EventOps.funnelConverted(
      Seq((1L, 0, 0L), (1L, 1, 5L), (1L, 2, pUs))
        .toDF("user_id", "rank", "us").as[(Long, Int, Long)], 100L)(spark)
      .collect()
    assert(run(100L).map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 100L)))
    assert(run(101L).isEmpty)
    // click with no prior view never starts a funnel
    val none = EventOps.funnelConverted(
      Seq((2L, 1, 0L), (2L, 2, 1L)).toDF("user_id", "rank", "us")
        .as[(Long, Int, Long)], 100L)(spark).collect()
    assert(none.isEmpty)
  }

  test("q86's plan is one shuffle + secondary sort, no join") {
    val plan = EventOps.q86Funnel.fn(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "funnel must not run as a self-join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges\n$plan")
    assert(plan.contains("MapGroups"), "secondary-sorted group fold expected")
  }
}
