package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.QueryDef.{noOracle, sql}
import graft.sources.Tables._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The Spark-side plumbing is real — schema, partition-parallel batched
  * processing (`mapPartitions` over an iterator, the JVM analogue of a
  * batched pandas UDF), deterministic outputs, tests. The actual codec
  * call is STUBBED (no image/audio libraries in this environment): the
  * `decodeStub` below computes a deterministic fake feature vector from
  * the bytes where a real decoder (JPEG decode, mel spectrogram, frame
  * grab) would run. Swapping the stub for a real codec changes no
  * schema, partitioning, or query shape.
  *
  * Scale posture (petabytes of media): payloads never shuffle — all
  * per-item operators are map-side; metadata-only queries prune the
  * binary column at the parquet reader (columnar layout means the bytes
  * are not even read); feature vectors (small, fixed-size) are what
  * flows into joins/ANN downstream.
  */
object MultimodalOps {

  final case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, features: Array[Float])

  /** Media table derived from `documents`: utf-8 payload bytes stand in
    * for image/audio blobs; type assigned round-robin for variety. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("content"))

  /** STUB decoder: 8 deterministic "features" per item — byte sums over
    * 8 strides, scaled. A real implementation would decode the payload
    * (e.g. image → pixels) and emit embeddings; same signature, same
    * batched iterator shape.
    */
  private[graft] def decodeStub(content: Array[Byte]): Array[Float] = {
    val k = 8
    val out = new Array[Float](k)
    var i = 0
    while (i < content.length) {
      out(i % k) += (content(i) & 0xff).toFloat
      i += 1
    }
    var j = 0
    while (j < k) { out(j) = out(j) / math.max(1, content.length); j += 1 }
    out
  }

  /** Partition-parallel batched decode: one iterator per partition (the
    * `mapInPandas` batch shape on the JVM) — payload bytes stay where
    * they are; only the small feature vectors come out. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.doc_id, r.content.length, decodeStub(r.content))
      }
    }
  }

  /** Frame-sampling plan for "video" payloads: pure metadata arithmetic
    * (first / middle / last frame of n_bytes/16 frames) — no decode. */
  def frameSamplePlan(media: DataFrame): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("doc_id"),
        (octet_length(col("content")) / 16).cast("int").as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        lit(0).as("f_first"),
        (col("n_frames") / 2).cast("int").as("f_mid"),
        greatest(col("n_frames") - 1, lit(0)).as("f_last"))

  /** Metadata-only media query: byte length, checksum, frame plan —
    * never touches a decoder, oracle-verifiable. */
  val q36MediaMeta: QueryDef = sql(
    "q36_media_meta",
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS checksum,
      |  CAST(octet_length(encode(text)) // 16 AS INT) AS n_frames
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""") { (s, d) =>
    mediaTable(s, d).filter(col("doc_id") < 200)
      .select(col("doc_id"), col("media_type"),
        octet_length(col("content")).as("n_bytes"),
        md5(col("content")).as("checksum"),
        (octet_length(col("content")) / 16).cast("int").as("n_frames"))
      .orderBy(col("doc_id"))
  }

  /** Feature extraction through the stubbed decoder — not SQL-expressible
    * (driver records rows-only); determinism pinned by unit tests.
    * Surfaces per-type feature norms to keep the output compact. */
  val q37MediaFeatures: QueryDef = noOracle("q37_media_features") { (s, d) =>
    import s.implicits._
    val media = mediaTable(s, d).as[MediaRow]
    val feats = extractFeatures(media)
    feats.toDF()
      .select(col("doc_id"), col("n_bytes"),
        round(aggregate(col("features"),
          lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")),
          6).as("feat_sq_norm"))
      .orderBy(col("doc_id"))
  }

  def all: Seq[QueryDef] = Seq(q36MediaMeta, q37MediaFeatures)
}
