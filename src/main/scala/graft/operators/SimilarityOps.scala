package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.QueryDef.sql
import graft.sources.Tables._

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim):
  * brute-force cosine top-k as the exactness baseline, all-pairs
  * near-duplicate detection on a bounded slice, and sign-LSH bucketed ANN
  * as the scale path.
  *
  * Cross-engine determinism: the dot product is an explicit left fold in
  * double precision — `aggregate(zip_with(a,b,(x,y)=>xd*yd), 0.0, +)` in
  * Spark, `list_reduce(list_transform(...), +)` in the oracle. Both
  * engines evaluate the same correctly-rounded IEEE operations in the
  * same order, so cosines are bit-identical and need no rounding.
  * Everything is built-in higher-order functions — no UDFs, stays in
  * codegen.
  *
  * Scale posture (billions of vectors): brute force is O(Q·N) with a
  * broadcast query set — right for small Q or as a re-ranker; the LSH
  * variant buckets by projection signs so candidate generation is an
  * equi-join on the bucket key (shuffle on bucket, not all-pairs). IVF
  * would follow the same shape with learned centroids as bucket keys.
  */
object SimilarityOps {

  /** left-fold double dot product. The composable higher-order form
    * (`aggregate(zip_with(...))`) computes the same fold but is
    * CodegenFallback; the hot path uses the native codegen expression
    * `graft.functions.FloatVectorDot`, which is bit-identical. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  private def nrm(a: Column): Column = sqrt(dot(a, a))

  /** oracle fragment: left-fold double dot product of list columns. */
  private def sqlDot(a: String, b: String): String =
    s"""list_reduce(list_concat([CAST(0 AS DOUBLE)],
       |      list_transform(range(1, len($a)+1),
       |        i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |    (acc, x) -> acc + x)""".stripMargin

  /** Brute-force cosine top-10 for 5 query vectors against the full
    * table — the exact baseline every ANN variant is measured against.
    * Query set broadcasts; scan side streams once.
    */
  val q33CosineTopK: QueryDef = sql(
    "q33_cosine_topk",
    s"""WITH d AS (SELECT vec_id, embedding, sqrt(${sqlDot("embedding", "embedding")}) AS nr
      |           FROM embeddings),
      |q AS (SELECT vec_id AS q_id, embedding AS q_emb, nr AS q_nr FROM d WHERE vec_id < 5),
      |c AS (SELECT q_id, d.vec_id AS neighbor,
      |        ${sqlDot("q_emb", "embedding")} / (q_nr * nr) AS cosine
      |      FROM q JOIN d ON d.vec_id <> q_id),
      |r AS (SELECT q_id, neighbor, cosine,
      |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor) AS rn
      |      FROM c)
      |SELECT q_id, neighbor, cosine, rn FROM r WHERE rn <= 10
      |ORDER BY q_id, rn""") { (s, d) =>
    val e = embeddings(s, d)
      .select(col("vec_id"), col("embedding"), nrm(col("embedding")).as("nr"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nr").as("q_nr"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("neighbor"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nr") * col("nr")))
          .as("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .orderBy(col("q_id"), col("rn"))
  }

  /** Embedding-cosine near-duplicate pairs over the full table —
    * all-pairs with the codegen dot product; the exactness verifier the
    * LSH/IVF variants are measured against (they are how candidates are
    * generated at real scale). Scales with the corpus rather than a
    * fixed slice so the bench reflects the actual table size.
    */
  val q34EmbedNearPairs: QueryDef = sql(
    "q34_embed_near_pairs",
    s"""WITH d AS (SELECT vec_id, embedding, sqrt(${sqlDot("embedding", "embedding")}) AS nr
      |           FROM embeddings),
      |c AS (SELECT a.vec_id AS v1, b.vec_id AS v2,
      |        ${sqlDot("a.embedding", "b.embedding")} / (a.nr * b.nr) AS cosine
      |      FROM d a JOIN d b ON a.vec_id < b.vec_id)
      |SELECT v1, v2, cosine FROM c WHERE cosine >= 0.4
      |ORDER BY v1, v2""") { (s, d) =>
    // explicit width on the probe side: the v1<v2 theta join is a
    // broadcast nested-loop whose parallelism equals the probe side's
    // partitioning, and a few-file scan is a single partition — the
    // N²/2 dot products would otherwise run single-threaded.
    val e = embeddings(s, d)
      .select(col("vec_id"), col("embedding"), nrm(col("embedding")).as("nr"))
      .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
    val a = e.select(col("vec_id").as("v1"), col("embedding").as("ea"),
      col("nr").as("na"))
    val b = e.select(col("vec_id").as("v2"), col("embedding").as("eb"),
      col("nr").as("nb"))
    a.join(b, col("v1") < col("v2"))
      .select(col("v1"), col("v2"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") >= 0.4)
      .orderBy(col("v1"), col("v2"))
  }

  /** The 8 random hyperplanes for sign-LSH, as 64-dim literal vectors.
    * Components are k/64 with k from a fixed LCG in [-48, 48]: every
    * value is exactly representable in BOTH float32 and float64 and has
    * an exact decimal literal, so the Spark plan (float literals through
    * the codegen dot) and the oracle SQL (double literals) compute
    * bit-identical projections and agree on every sign. */
  private val hyperplanes: Array[Array[Float]] = {
    var seed = 20260812L
    def next(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); seed }
    Array.fill(8) {
      Array.fill(64) {
        val k = (math.floorMod(next() >>> 16, 97L) - 48L).toInt
        k / 64.0f
      }
    }
  }

  private def sqlPlaneLit(p: Array[Float]): String =
    p.map(v => {
      val k = math.round(v * 64)
      s"CAST($k AS DOUBLE) / 64"
    }).mkString("([", ", ", "])")

  /** Sign-LSH bucketed ANN: 8-bit bucket from the signs of the vector's
    * projections onto 8 fixed random hyperplanes; candidates meet on
    * the bucket key (equi-join shuffle, never all-pairs), then exact
    * cosine re-ranks the bucket. Returns top-5 per query with the rank.
    */
  val q35AnnLshBucketed: QueryDef = {
    val sqlBucket = hyperplanes.zipWithIndex
      .map { case (p, j) =>
        s"(CASE WHEN ${sqlDot("embedding", sqlPlaneLit(p))} > 0 THEN ${1 << j} ELSE 0 END)" }
      .mkString(" + ")
    sql(
      "q35_ann_lsh_bucketed",
      s"""WITH d AS (SELECT vec_id, embedding,
        |             sqrt(${sqlDot("embedding", "embedding")}) AS nr,
        |             $sqlBucket AS bucket
        |           FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb, nr AS q_nr, bucket FROM d
        |      WHERE vec_id < 20),
        |c AS (SELECT q_id, d.vec_id AS neighbor,
        |        ${sqlDot("q_emb", "embedding")} / (q_nr * nr) AS cosine
        |      FROM q JOIN d ON d.bucket = q.bucket AND d.vec_id <> q_id),
        |r AS (SELECT q_id, neighbor, cosine,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor) AS rn
        |      FROM c)
        |SELECT q_id, neighbor, cosine, rn FROM r WHERE rn <= 5
        |ORDER BY q_id, rn""") { (s, d) =>
      // projections via the codegen float dot against literal plane
      // vectors — pure map-side, 8 fused expressions per row.
      val bucket = hyperplanes.zipWithIndex
        .map { case (p, j) =>
          when(dot(col("embedding"), typedlit(p)) > 0, 1 << j).otherwise(0) }
        .reduce(_ + _)
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), nrm(col("embedding")).as("nr"),
          bucket.as("bucket"))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nr").as("q_nr"), col("bucket"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("neighbor"))
      e.join(broadcast(q), Seq("bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor"),
          (dot(col("q_emb"), col("embedding")) / (col("q_nr") * col("nr")))
            .as("cosine"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .orderBy(col("q_id"), col("rn"))
    }
  }

  /** universal double dot product: works for float/double array mixes
    * (each element promoted to double), matching `sqlDot`'s CAST
    * semantics — used where one operand is a learned (double) centroid.
    * Native codegen (`MixedVectorDot`), bit-identical to the HOF fold. */
  private def dotAny(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDotAny(a, b)

  /** IVF ANN with LEARNED centroids: seed with the vectors vec_id 0..15,
    * run one Lloyd iteration (assign every vector to its nearest seed,
    * recompute each centroid as the mean of its cell), then
    * coarse-quantize against the learned centroids and search only the
    * query's 2 nearest cells (nprobe=2) with exact cosine re-ranking.
    *
    * Scale shape: assignments are map-side broadcast argmaxes —
    * crossJoin(16 centroids) + partial `max_by` aggregation, no window
    * sort over the full table; candidates meet on the cell-id equi-join.
    * The centroid update is bit-reproducible across engines: per
    * (cell, dimension) the component sum is an ordered left fold over
    * vec_id (partitioning-independent), divided by the cell count in
    * doubles — so the learned centroids, and every cosine derived from
    * them, hash-match the oracle exactly.
    */
  val q44AnnIvf: QueryDef = {
    sql(
      "q44_ann_ivf",
      s"""WITH d AS (SELECT vec_id, embedding, sqrt(${sqlDot("embedding", "embedding")}) AS nr
        |           FROM embeddings),
        |seeds AS (SELECT vec_id AS c_id, embedding AS c_emb, nr AS c_nr
        |          FROM d WHERE vec_id < 16),
        |a0 AS (SELECT vec_id, embedding, nr, c_id,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id
        |           ORDER BY ${sqlDot("embedding", "c_emb")} / (nr * c_nr) DESC, c_id) AS rn
        |       FROM d CROSS JOIN seeds),
        |asn0 AS (SELECT vec_id, embedding, c_id FROM a0 WHERE rn = 1),
        |comp AS (SELECT c_id, dim, CAST(embedding[dim] AS DOUBLE) AS v, vec_id
        |         FROM asn0 CROSS JOIN (SELECT unnest(range(1, 65)) AS dim)),
        |dm AS (SELECT c_id, dim,
        |         list_reduce(list_concat([CAST(0 AS DOUBLE)],
        |           list(v ORDER BY vec_id)), (acc, x) -> acc + x)
        |           / count(*) AS m
        |       FROM comp GROUP BY c_id, dim),
        |cents AS (SELECT c_id, list(m ORDER BY dim) AS c_emb FROM dm GROUP BY c_id),
        |cents2 AS (SELECT c_id, c_emb,
        |             sqrt(${sqlDot("c_emb", "c_emb")}) AS c_nr FROM cents),
        |a1 AS (SELECT vec_id, embedding, nr, c_id,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id
        |           ORDER BY ${sqlDot("embedding", "c_emb")} / (nr * c_nr) DESC, c_id) AS crn
        |       FROM d CROSS JOIN cents2),
        |cells AS (SELECT vec_id, embedding, nr, c_id FROM a1 WHERE crn = 1),
        |probes AS (SELECT vec_id AS q_id, embedding AS q_emb, nr AS q_nr, c_id
        |           FROM a1 WHERE crn <= 2 AND vec_id < 5),
        |c AS (SELECT q_id, cells.vec_id AS neighbor,
        |        ${sqlDot("q_emb", "embedding")} / (q_nr * nr) AS cosine
        |      FROM probes JOIN cells ON cells.c_id = probes.c_id
        |        AND cells.vec_id <> probes.q_id),
        |r AS (SELECT q_id, neighbor, cosine,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor) AS rn
        |      FROM c)
        |SELECT q_id, neighbor, cosine, rn FROM r WHERE rn <= 5
        |ORDER BY q_id, rn""") { (s, d) =>
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), nrm(col("embedding")).as("nr"))
      val seeds = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
          col("nr").as("c_nr"))
      // argmax = max over (cosine, -c_id): lexicographic struct max ≡ the
      // oracle's ORDER BY cosine DESC, c_id — a map-side partial agg, no
      // window sort over the full table.
      def assign(vecs: DataFrame, cs: DataFrame,
          cosOf: (Column, Column) => Column): DataFrame =
        vecs.crossJoin(broadcast(cs))
          .withColumn("c_cos", cosOf(col("embedding"), col("c_emb")) /
            (col("nr") * col("c_nr")))
          .groupBy(col("vec_id"))
          .agg(
            max_by(col("c_id"), struct(col("c_cos"), (-col("c_id")).as("neg")))
              .as("c_id"),
            first(col("embedding")).as("embedding"),
            first(col("nr")).as("nr"))
      val asn0 = assign(e, seeds, dot)
      // Lloyd update: per (cell, dim) an ordered-fold sum over vec_id —
      // identical double arithmetic in both engines regardless of
      // partitioning — then mean, then reassemble dim-ordered arrays.
      val comp = asn0
        .select(col("vec_id"), col("c_id"), posexplode(col("embedding")))
        .select(col("c_id"), col("pos").as("dim"),
          col("col").cast("double").as("v"), col("vec_id"))
      val dm = comp.groupBy(col("c_id"), col("dim"))
        .agg(collect_list(struct(col("vec_id"), col("v"))).as("vs"),
          count(lit(1)).as("cnt"))
        .select(col("c_id"), col("dim"),
          (aggregate(transform(array_sort(col("vs")), x => x.getField("v")),
            lit(0.0), (acc, x) => acc + x) / col("cnt")).as("m"))
      val cents = dm.groupBy(col("c_id"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          x => x.getField("m")).as("c_emb"))
        .select(col("c_id"), col("c_emb"),
          sqrt(dotAny(col("c_emb"), col("c_emb"))).as("c_nr"))
      val asn1 = assign(e, cents, dotAny)
      val cells = asn1
        .select(col("vec_id"), col("embedding"), col("nr"), col("c_id"))
      // query probes: top-2 learned centroids for the 5 query vectors —
      // a window over 5×16 rows, trivially small.
      val wProbe = Window.partitionBy(col("vec_id"))
        .orderBy(col("c_cos").desc, col("c_id"))
      val probes = e.filter(col("vec_id") < 5)
        .crossJoin(broadcast(cents))
        .withColumn("c_cos", dotAny(col("embedding"), col("c_emb")) /
          (col("nr") * col("c_nr")))
        .withColumn("crn", row_number().over(wProbe))
        .filter(col("crn") <= 2)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nr").as("q_nr"), col("c_id"))
      val wRank = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("neighbor"))
      cells.join(broadcast(probes), Seq("c_id"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor"),
          (dot(col("q_emb"), col("embedding")) / (col("q_nr") * col("nr")))
            .as("cosine"))
        .withColumn("rn", row_number().over(wRank))
        .filter(col("rn") <= 5)
        .orderBy(col("q_id"), col("rn"))
    }
  }

  def all: Seq[QueryDef] =
    Seq(q33CosineTopK, q34EmbedNearPairs, q35AnnLshBucketed, q44AnnIvf)
}
