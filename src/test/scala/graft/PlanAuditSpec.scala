package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audit: the scale properties README promises, pinned as
  * tests so a refactor cannot silently regress them — filters/projections
  * reach the parquet scan, dims broadcast, top-k avoids global sorts,
  * the similarity hot path uses the native codegen expression.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame): String = {
    df.collect() // let AQE settle on the final plan
    df.queryExecution.executedPlan.toString
  }

  private def formatted(df: DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q01: filter pushed to the scan, columns pruned") {
    val plan = formatted(SparkEntry.queries("q01_pricing_summary")(spark, sf))
    assert(plan.contains("LessThan(l_shipdate"))
    val readSchema = plan.linesIterator
      .find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"scan reads more than needed: $readSchema")
  }

  test("q06 star join: dimension joins broadcast, no sort-merge") {
    val plan = finalPlan(SparkEntry.queries("q06_star_join")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"), "star join fell back to SMJ")
    // region filter reached its scan
    assert(plan.contains("EqualTo(r_name,ASIA)"))
  }

  test("q02 top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = finalPlan(SparkEntry.queries("q02_top_customers")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q33 similarity uses the native codegen dot product") {
    val plan = finalPlan(SparkEntry.queries("q33_cosine_topk")(spark, sf))
    assert(plan.toLowerCase.contains("floatvectordot"))
    // and the query-vector filter reached the scan
    assert(plan.contains("LessThan(vec_id,5)"))
  }

  test("q07 pair expansion has no join at all") {
    val plan = finalPlan(SparkEntry.queries("q07_supplier_pairs")(spark, sf))
    assert(!plan.contains("Join"), "pair counting should be join-free")
  }
}
