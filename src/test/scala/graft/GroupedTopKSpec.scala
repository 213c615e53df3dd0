package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKLongPairs
import graft.operators.TextOps

class GroupedTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("aggregator matches the window row_number formulation") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(5000)(i =>
      (s"g${rnd.nextInt(40)}", rnd.nextInt(200).toLong, i.toLong))
    val df = rows.toDF("g", "v", "id")
    val topk = udaf(new TopKLongPairs(4))
    val got = df.groupBy($"g").agg(topk($"v", $"id").as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).cast("long").as("rnk"),
        $"col._2".as("id"), $"col._1".as("v"))
    val want = df.withColumn("rnk",
        row_number().over(Window.partitionBy($"g")
          .orderBy($"v".desc, $"id")).cast("long"))
      .filter($"rnk" <= 4).select($"g", $"rnk", $"id", $"v")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("buffer stays bounded at k under arbitrary reduce/merge order") {
    val agg = new TopKLongPairs(3)
    var buf = agg.zero
    (0L until 1000L).foreach(i => buf = agg.reduce(buf, (i % 17, i)))
    assert(buf.length == 3)
    val merged = agg.merge(buf, agg.reduce(agg.zero, (100L, 0L)))
    assert(merged.length == 3 && merged.head._1 == 100L)
    // strict order: value desc, id asc
    assert(merged.sliding(2).forall { case Array(a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2) })
  }

  test("q85's plan is window-free with map-side partial aggregation") {
    val plan = TextOps.q85GroupedTopK.fn(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "grouped top-k must not fall back to the windowed full sort")
    assert(plan.contains("ObjectHashAggregate"),
      "typed aggregator should run as ObjectHashAggregate")
    assert(plan.contains("partial_"),
      "map-side partial combine must be present (k rows per partition-group)")
  }
}
