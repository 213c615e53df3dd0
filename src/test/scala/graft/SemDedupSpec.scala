package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural pins for q102 (SemDeDup over learned IVF cells). The
  * driver's oracle proves the summary is COMPUTED correctly, but a
  * silently-collapsed clustering (all vectors in one cell → n² pairs,
  * or every vector alone → nothing ever dropped) would still hash-match
  * its own oracle — so the cluster structure and the drop semantics are
  * pinned separately, at the same 20k-vector decade fixture the recall
  * specs use (10× sf0.1 with the orthogonal per-replica diagonal — the
  * exact construction and size of the sf1 bench corpus).
  *
  * What is pinned:
  *  - the registered summary is CONSISTENT with a spec-side re-derivation
  *    of "dropped" from the exhaustive exact pair set + the cluster
  *    assignment (ties the registered plan to the semantics, the q34
  *    equivalence pattern);
  *  - cluster count grows with the corpus (k = max(16, n/125)) and no
  *    cell degenerates to a corpus-sized population — the structural
  *    guarantee that keeps within-cluster pair volume LINEAR in n (the
  *    round-9 label-keyed form failed exactly this, 10.8× wall per
  *    decade);
  *  - drop COVERAGE vs the cluster-free exhaustive ground truth stays
  *    above a measured floor — cluster-scoped dropping misses cross-cell
  *    pairs by design (SemDeDup's stated trade), but a useless
  *    clustering would send coverage toward 0 while staying hash-green.
  */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  /** (exhaustively droppable ids, cell-locally droppable ids, assignment)
    * — droppable = has a lower-id mate at cosine ≥ 0.4; cell-local
    * additionally requires the mate share the vector's learned cell. */
  private def dropSets(dir: String): (Set[Long], Set[Long], Map[Long, Long]) = {
    val pairs = graft.operators.SimilarityOps
      .embedNearPairsAllPairs(spark, dir)
      .select(col("v1"), col("v2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val asn = graft.operators.SimilarityOps.semDedupAssignment(spark, dir)
      .select(col("vec_id"), col("c_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val droppable = pairs.map(_._2).toSet
    val cellDropped = pairs.collect {
      case (a, b) if asn(a) == asn(b) => b
    }.toSet
    (droppable, cellDropped, asn)
  }

  test("q102 summary at the 20k decade fixture equals the re-derived " +
      "cell-local drop set, clusters scale with n, and drop coverage " +
      "vs the exhaustive ground truth holds its floor") {
    val dir = TestEmbeddingFixtures.scaled(spark, "/root/testdata/sf0.1", 10)
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(n == 20000L)
    val (droppable, cellDropped, asn) = dropSets(dir)

    // registered-summary consistency: totals re-derive exactly
    val got = SparkEntry.queries("q102_semantic_dedup")(spark, dir).collect()
    assert(got.map(_.getLong(1)).sum == n, "n_vecs must partition the corpus")
    assert(got.map(_.getLong(2)).sum == cellDropped.size.toLong,
      "summary n_dropped must equal the re-derived cell-local drop set")
    val allIds = asn.keysIterator.sum
    assert(got.map(_.getLong(3)).sum == allIds - cellDropped.sum,
      "kept_id_sum must be the complement of the dropped ids")

    // cluster structure: k grew with the corpus and no cell collapsed
    val k = graft.operators.SimilarityOps.semDedupK(n)
    assert(k == 160)
    val cellSizes = asn.groupBy(_._2).map(_._2.size)
    assert(cellSizes.size > 100,
      s"expected ~$k populated cells, got ${cellSizes.size}")
    // a degenerate assignment (one corpus-sized cell) reintroduces n²;
    // allow healthy imbalance over random data, never collapse
    assert(cellSizes.max < n / 10,
      s"largest cell ${cellSizes.max} of $n — clustering collapsed")

    // coverage floor vs the exhaustive exact form — measured 0.344 at
    // this fixture (0.306 at sf0.1). Cross-cell misses are SemDeDup's
    // designed trade, amplified here because the synthetic corpus is
    // near-random: a 0.4-cosine pair spans ~66° and straddles Voronoi
    // boundaries freely (the q34 lesson), where a real embedding
    // corpus's near-dups (cosine ≥ 0.8) co-cluster far more reliably.
    // The floor is an anti-collapse tripwire, not a quality bar.
    val coverage = cellDropped.size.toDouble / droppable.size
    info(f"drop coverage at 20k: $coverage%.3f " +
      s"(${cellDropped.size}/${droppable.size})")
    assert(coverage >= 0.25,
      f"cell-local drop coverage $coverage%.3f collapsed below 0.25")
    // and the subset property: cluster-scoping can only ever MISS drops
    assert(cellDropped.subsetOf(droppable))
  }

  test("q102 drop coverage holds at driver scale too (2k vectors, " +
      "16 cells — the floor regime)") {
    val dir = "/root/testdata/sf0.1"
    val (droppable, cellDropped, _) = dropSets(dir)
    val coverage = cellDropped.size.toDouble / droppable.size
    info(f"drop coverage at sf0.1: $coverage%.3f " +
      s"(${cellDropped.size}/${droppable.size})")
    assert(coverage >= 0.25,
      f"cell-local drop coverage $coverage%.3f collapsed below 0.25")
  }
}
