package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomFunctions
import graft.operators.TextOps

class BloomFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("no false negatives: every inserted key passes the probe") {
    val keys = (0L until 5000L).map(k => k * 2654435761L).toDF("h")
    val bloom = keys.stat.bloomFilter("h", 5000, 0.03)
    val missed = keys
      .filter(!BloomFunctions.mightContainLong(col("h"), bloom))
      .count()
    assert(missed == 0, "a Bloom filter must never drop an inserted key")
  }

  test("pruning is real: non-member pass rate stays near the configured fpp") {
    val members = (0L until 5000L).map(k => k * 2654435761L)
    val bloom = members.toDF("h").stat.bloomFilter("h", 5000, 0.03)
    // disjoint key universe (odd keys; members are all even)
    val probes = (0L until 20000L).map(k => k * 2 + 1).toDF("h")
    val passed = probes
      .filter(BloomFunctions.mightContainLong(col("h"), bloom))
      .count()
    val rate = passed.toDouble / 20000
    assert(rate < 0.10, f"false-positive rate $rate%.4f should be ~0.03")
  }

  test("null key propagates null (IN-style three-valued logic)") {
    val bloom = Seq(1L).toDF("h").stat.bloomFilter("h", 10, 0.03)
    val rows = Seq[Option[Long]](Some(1L), None).toDF("h")
      .select(BloomFunctions.mightContainLong(col("h"), bloom).as("hit"))
      .collect()
    assert(rows(0).getBoolean(0))
    assert(rows(1).isNullAt(0))
  }

  test("q84 equals the plain-join formulation (bloom stage is exact)") {
    val got = TextOps.bloomDecontaminate(spark, sf, useBloom = true).collect()
    val plain = TextOps.bloomDecontaminate(spark, sf, useBloom = false).collect()
    assert(got.map(_.toString).toSeq == plain.map(_.toString).toSeq)
    assert(got.length > 0, "sf0.01 corpus must contain contaminated docs")
  }

  test("the bloom probe runs inside the scan stage, before the exact join") {
    val plan = TextOps.q84BloomDecontaminate.fn(spark, sf)
      .queryExecution.executedPlan.toString
    val probeAt = plan.indexOf("bloom_might_contain")
    val joinAt = plan.indexOf("BroadcastHashJoin")
    assert(probeAt >= 0, "custom expression must appear in the physical plan")
    assert(joinAt >= 0, "exact FP-removal join must remain")
    // physical plans print top-down: the join sits ABOVE the filter,
    // i.e. earlier in the string — the filter is join input, not output
    assert(joinAt < probeAt,
      "bloom filter must prune the scan side feeding the join")
  }
}
