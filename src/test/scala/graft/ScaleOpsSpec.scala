package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScaleOps
import graft.sources.Layout

class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("salted aggregation equals the direct group-by exactly") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val direct = li.groupBy(col("l_returnflag").as("k"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sv"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    val salted = ScaleOps.saltedSum(li, col("l_returnflag"), col("l_quantity"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("approx_count_distinct stays within its error bound") {
    val rows = ScaleOps.approxVsExactOrders(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_orders").toDouble
      val approx = r.getAs[Long]("approx_orders").toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"${r.getAs[String]("l_returnflag")}: $approx vs $exact")
    }
    // the registered (hash-compared) form reports the same bound as TRUE
    val q39 = ScaleOps.q39ApproxDistinct.fn(spark, sf).collect()
    assert(q39.nonEmpty && q39.forall(_.getAs[Boolean]("within_rsd")))
  }

  test("approx_percentile's answer ranks within n/accuracy of the " +
      "exact median and the registered form pins it TRUE") {
    val rows = ScaleOps.q82ApproxQuantile.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within_rank_bound")),
      rows.map(r => s"${r.getAs[String]("l_returnflag")}: " +
        s"median=${r.getAs[Long]("exact_median_cents")}").mkString(", "))
    // the exact order statistic is a real data value (cents are integer)
    rows.foreach(r => assert(r.getAs[Long]("exact_median_cents") > 0))
  }

  test("partitioned+sorted layout prunes partitions at scan time") {
    val out = Files.createTempDirectory("layout").toString + "/li"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    Layout.writeIndexed(li, out, "l_returnflag", "l_suppkey", "l_shipdate")
    val all = Layout.filesRead(spark, out, "l_quantity >= 0")
    val pruned = Layout.filesRead(spark, out, "l_returnflag = 'R'")
    assert(all > pruned, s"expected pruning: all=$all pruned=$pruned")
    // pruned scan still returns correct data
    val n = spark.read.parquet(out).filter(col("l_returnflag") === "R").count()
    assert(n == li.filter(col("l_returnflag") === "R").count())
  }

  test("incremental refresh equals the one-shot aggregate bit-for-bit") {
    val got = ScaleOps.q87IncrAggRefresh.fn(spark, sf)
    val want = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // every history row must come from the artifact, not a rescan: the
    // snapshot side of the merge is a checkpoint scan in the plan
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"),
      s"snapshot side should read the checkpointed artifact\n$plan")
  }
}
