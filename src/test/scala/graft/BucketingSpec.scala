package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** Co-located join via bucketed tables: both sides pre-bucketed on the
  * join key join with NO exchange in the plan — the shuffle the
  * unbucketed join pays happens once at layout time instead of per
  * query (SURVEY §2.A A4; the at-scale answer for recurring fact⋈fact
  * joins).
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private val sf = "/root/testdata/sf0.001"

  test("bucketed-bucketed join plans without any exchange and matches " +
      "the unbucketed result") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey")
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(ord, "ord_b", "o_orderkey", 4)

    // disable auto-broadcast so the join strategy question is real: an
    // unbucketed join must shuffle, a bucketed one must not.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("q"))
      bucketed.collect()
      val bPlan = bucketed.queryExecution.executedPlan.toString
      val joinPart = bPlan.split("HashAggregate").last // below the agg
      assert(joinPart.contains("SortMergeJoin") || joinPart.contains("ShuffledHashJoin"))
      assert(!joinPart.contains("Exchange"),
        s"bucketed join still shuffles:\n$joinPart")

      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("q"))
      plain.collect()
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"),
        "control: unbucketed join should shuffle")

      val a = bucketed.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val b = plain.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(a.keySet == b.keySet)
      a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-9) }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
      ()
    }
  }
}
