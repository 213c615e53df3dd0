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
    val e = embeddings(s, d)
      .select(col("vec_id"), col("embedding"), nrm(col("embedding")).as("nr"))
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

  /** Sign-LSH bucketed ANN: 8-bit bucket from the signs of the first 8
    * coordinates (axis-aligned random-hyperplane LSH); candidates meet
    * on the bucket key (equi-join shuffle, never all-pairs), then exact
    * cosine re-ranks the bucket. Returns top-5 per query with the rank.
    */
  val q35AnnLshBucketed: QueryDef = {
    val sqlBucket = (1 to 8)
      .map(k => s"(CASE WHEN embedding[$k] > 0 THEN ${1 << (k - 1)} ELSE 0 END)")
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
      val bucket = (0 until 8)
        .map(k => when(element_at(col("embedding"), k + 1) > 0, 1 << k).otherwise(0))
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

  /** IVF-style ANN: coarse-quantize every vector to its nearest of 16
    * fixed centroids (the vectors with vec_id 0..15 — deterministic
    * "k-means init" seeds), then search only the query's 2 nearest cells
    * (nprobe=2) with exact cosine re-ranking. The inverted-file shape at
    * scale: assignment is a map-side broadcast argmax, candidates meet
    * on the cell id equi-join — learned centroids would slot in without
    * changing the plan.
    */
  val q44AnnIvf: QueryDef = {
    val cent = s"""(SELECT vec_id AS c_id, embedding AS c_emb,
       |        sqrt(${sqlDot("embedding", "embedding")}) AS c_nr
       |        FROM embeddings WHERE vec_id < 16)""".stripMargin
    sql(
      "q44_ann_ivf",
      s"""WITH d AS (SELECT vec_id, embedding, sqrt(${sqlDot("embedding", "embedding")}) AS nr
        |           FROM embeddings),
        |cent AS $cent,
        |asn AS (SELECT vec_id, embedding, nr, c_id,
        |          ROW_NUMBER() OVER (PARTITION BY vec_id
        |            ORDER BY ${sqlDot("embedding", "c_emb")} / (nr * c_nr) DESC, c_id) AS crn
        |        FROM d CROSS JOIN cent),
        |cells AS (SELECT vec_id, embedding, nr, c_id FROM asn WHERE crn = 1),
        |probes AS (SELECT vec_id AS q_id, embedding AS q_emb, nr AS q_nr, c_id
        |           FROM asn WHERE crn <= 2 AND vec_id < 5),
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
      val cents = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
          col("nr").as("c_nr"))
      val wAsn = Window.partitionBy(col("vec_id"))
        .orderBy(col("c_cos").desc, col("c_id"))
      val asn = e.crossJoin(broadcast(cents))
        .withColumn("c_cos",
          dot(col("embedding"), col("c_emb")) / (col("nr") * col("c_nr")))
        .withColumn("crn", row_number().over(wAsn))
      val cells = asn.filter(col("crn") === 1)
        .select(col("vec_id"), col("embedding"), col("nr"), col("c_id"))
      val probes = asn.filter(col("crn") <= 2 && col("vec_id") < 5)
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
