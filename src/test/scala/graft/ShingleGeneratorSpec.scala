package graft

import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ShingleGenerator

class ShingleGeneratorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def shingles(c: org.apache.spark.sql.Column) =
    GraftBridge.column(ShingleGenerator(GraftBridge.expression(c)))

  test("emits one adjacent pair per position, preserving duplicates") {
    val rows = Seq("a b c a b").toDF("t")
      .select(shingles(split(col("t"), " ")).as("s"))
      .as[String].collect().toSeq
    assert(rows == Seq("a b", "b c", "c a", "a b"))
  }

  test("single-token and empty inputs emit no rows") {
    val n = Seq("one", "").toDF("t")
      .select(shingles(split(trim(col("t")), " ")))
      .count()
    // "" splits to [""] (1 element) and "one" to ["one"] — no pairs
    assert(n == 0)
  }

  test("matches the lead-window formulation on real documents") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val viaGen = docs
      .select(col("doc_id"), shingles(split(trim(col("text")), " ")).as("tok"))
      .groupBy("doc_id").count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val viaWindow = docs
      .select(col("doc_id"), posexplode(split(trim(col("text")), " ")))
      .withColumn("nx", lead(col("col"), 1).over(w))
      .filter(col("nx").isNotNull)
      .select(col("doc_id"), concat(col("col"), lit(" "), col("nx")).as("tok"))
      .groupBy("doc_id").count()
    val a = viaGen.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = viaWindow.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("non-string-array input fails analysis") {
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Array(1, 2, 3), 0)).toDF("a", "x")
        .select(shingles(col("a"))).collect()
    }
    assert(err.getMessage.contains("array<string>"))
  }
}
