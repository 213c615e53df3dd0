package graft

import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{NGramGenerator, ShingleGenerator}

class NGramGeneratorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def ngrams(c: org.apache.spark.sql.Column, n: Int) =
    GraftBridge.column(NGramGenerator(GraftBridge.expression(c), n))

  test("emits one space-joined window per start position") {
    val rows = Seq("a b c d e").toDF("t")
      .select(ngrams(split(col("t"), " "), 3).as("g"))
      .as[String].collect().toSeq
    assert(rows == Seq("a b c", "b c d", "c d e"))
  }

  test("documents shorter than the window emit no rows; exact-length one") {
    val rows = Seq("a b", "a b c", "").toDF("t")
      .select(ngrams(split(trim(col("t")), " "), 3).as("g"))
      .as[String].collect().toSeq
    assert(rows == Seq("a b c"))
  }

  test("preserves within-document duplicate windows (multiset semantics)") {
    val rows = Seq("x y x y x y").toDF("t")
      .select(ngrams(split(col("t"), " "), 4).as("g"))
      .as[String].collect().toSeq
    assert(rows == Seq("x y x y", "y x y x", "x y x y"))
  }

  test("n=2 agrees with ShingleGenerator on real documents") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def counted(c: org.apache.spark.sql.Column) =
      docs.select(col("doc_id"), c.as("tok"))
        .groupBy(col("doc_id"), col("tok")).count()
    val a = counted(ngrams(split(trim(col("text")), " "), 2))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val b = counted(GraftBridge.column(ShingleGenerator(
        GraftBridge.expression(split(trim(col("text")), " ")))))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("non-string-array input fails analysis") {
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Array(1, 2, 3), 0)).toDF("a", "x")
        .select(ngrams(col("a"), 3)).collect()
    }
    assert(err.getMessage.contains("array<string>"))
  }
}
