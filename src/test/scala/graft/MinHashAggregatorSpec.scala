package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashAggregator

class MinHashAggregatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private val P = 2147483647L
  private val perms = Array((1373158607L, 239081663L), (53710185L, 1592467581L),
    (590620973L, 525901256L), (479341425L, 299655412L))

  private def tokHash(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("one-pass aggregator equals the relational cross-join formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"),
        explode(array_distinct(split(trim(col("text")), " "))).as("tok"))
      .select(col("doc_id"), tokHash(col("tok")).as("hv"))

    // relational formulation (what the oracle verifies in q26)
    val permDf = perms.zipWithIndex
      .map { case ((a, b), j) => (j, a, b) }.toSeq.toDF("j", "a", "b")
    val relational = docs.crossJoin(broadcast(permDf))
      .groupBy(col("doc_id"), col("j"))
      .agg(min((col("a") * (col("hv") % P) + col("b")) % P).as("m"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("j"), col("m")))).as("sig"))
      .select(col("doc_id"),
        transform(col("sig"), s => s.getField("m")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap

    // one-pass typed aggregator
    val mh = udaf(new MinHashAggregator(perms, P))
    val onePass = docs.groupBy(col("doc_id")).agg(mh(col("hv")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap

    assert(onePass == relational)
    assert(onePass.nonEmpty && onePass.values.forall(_.length == perms.length))
  }
}
