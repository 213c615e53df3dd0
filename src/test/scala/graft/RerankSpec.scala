package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** q135 retrieve→rerank: the reranked top-10 must come from the BM25
  * top-100 candidate set with ranks consistent with q94's ordering, the
  * positional proximity feature must equal a from-scratch Scala
  * recompute over the raw text, and the plan must prove the expensive
  * positional stage touches ONLY the candidates (semi-join below the
  * posexplode Generate).
  */
class RerankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  private val sf = "/root/testdata/sf0.01"

  private lazy val result =
    SparkEntry.queries("q135_bm25_rerank")(spark, sf).collect()

  test("reranked rows come from the BM25 top-100 with consistent ranks " +
      "and the exact rerank formula") {
    val (scored, _) = TextOps.bm25Machinery(spark, sf)
    val top100 = scored.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, s, _) => (-s, id) }
      .take(100)
    val rankOf = top100.zipWithIndex
      .map { case ((id, s, nt), i) => id -> (i + 1L, s, nt) }.toMap
    assert(result.length == 10)
    result.foreach { r =>
      val (rank, s, nt) = rankOf.getOrElse(r.getLong(0),
        fail(s"doc ${r.getLong(0)} not in the BM25 top-100"))
      assert(r.getLong(3) == rank, s"bm25_rank mismatch for ${r.getLong(0)}")
      assert(r.getLong(1) == s && r.getLong(2) == nt)
      val md = r.getLong(4)
      val expected = s + nt * 300000L + (if (md < 0) 0L else 1000000L / (1 + md))
      assert(r.getLong(5) == expected, s"rerank formula for ${r.getLong(0)}")
    }
    // presentation order: rerank desc, doc_id asc
    val key = result.map(r => (-r.getLong(5), r.getLong(0))).toSeq
    assert(key == key.sorted, "not ordered by (rerank desc, doc_id)")
  }

  test("min_dist equals a from-scratch recompute over the raw text") {
    val (_, qTerms) = TextOps.bm25Machinery(spark, sf)
    val terms = qTerms.collect().map(_.getString(0)).toSet
    assert(terms.size == 3)
    val ids = result.map(_.getLong(0)).toSet
    val byName = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .filter(r => ids(r.getLong(0)))
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    result.foreach { r =>
      val pos = byName(r.getLong(0)).trim.split(" ").zipWithIndex
        .collect { case (t, i) if terms(t) => (t, i.toLong) }
      val dists = for {
        (t1, p1) <- pos; (t2, p2) <- pos if t1 < t2
      } yield math.abs(p1 - p2)
      val expected = if (dists.isEmpty) -1L else dists.min
      assert(r.getLong(4) == expected,
        s"min_dist for doc ${r.getLong(0)}: got ${r.getLong(4)}, want $expected")
    }
  }

  test("plan: the positional stage explodes only the semi-joined " +
      "candidate docs") {
    import org.apache.spark.sql.functions.{col, lit}
    // the registered query localCheckpoints this stage (truncating its
    // lineage out of the final plan), so pin the stage's own plan
    val cand = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id")).limit(100)
    val qTerms = spark.range(3)
      .select(lit("x").as("tok"))
    val df = TextOps.rerankPositionsPlan(spark, sf, cand, qTerms)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val gen = plan.indexOf("Generate posexplode")
    assert(gen >= 0, s"no posexplode Generate in plan:\n$plan")
    assert(plan.indexOf("LeftSemi", gen) > gen,
      s"posexplode input is not candidate-pruned by a semi-join:\n$plan")
  }
}
