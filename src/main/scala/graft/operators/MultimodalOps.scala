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

  final case class MediaDecoded(
      doc_id: Long, media_type: String, n_bytes: Int,
      first_byte: Int, last_byte: Int, byte_sum: Long,
      strides: Array[Long], features: Array[Float])

  /** The REAL decode pass: parses a deterministic header from the raw
    * payload (length, first/last byte, byte checksum) and computes the
    * 8 integer stride sums the stub's float features are derived from
    * (features(j) = strides(j) / n_bytes — byte sums stay < 2^24 so the
    * stub's float accumulation equals the integer sum exactly). Replaces
    * nothing downstream: [[extractFeatures]]/[[decodeStub]] keep the
    * float-feature surface; this pass is the oracle-checkable decode.
    * Same batched `mapPartitions` shape a real codec would use. */
  def decodeWithHeader(media: Dataset[MediaRow]): Dataset[MediaDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val c = r.content
        val strides = new Array[Long](8)
        var sum = 0L
        var i = 0
        while (i < c.length) {
          val b = (c(i) & 0xff).toLong
          strides(i % 8) += b
          sum += b
          i += 1
        }
        val feats = Array.tabulate(8)(j =>
          strides(j).toFloat / math.max(1, c.length))
        MediaDecoded(r.doc_id, r.media_type, c.length,
          if (c.length > 0) c(0) & 0xff else -1,
          if (c.length > 0) c(c.length - 1) & 0xff else -1,
          sum, strides, feats)
      }
    }
  }

  /** Media decode, HASH-verified: every registered column is parsed from
    * the payload bytes inside the `mapPartitions` decoder and mirrored
    * byte-for-byte by the DuckDB oracle (`ascii`/`octet_length`/list
    * comprehension over char positions — exact integer arithmetic on
    * both sides; the corpus is ASCII, so char codes ARE payload bytes,
    * which the oracle relies on and the Spark side does not). The stride
    * sums travel as a space-joined string (the q56 array-comparator
    * lesson). Degenerate payloads are mirrored too: strides with no
    * positions coalesce to 0 (docs shorter than 8 bytes) and first/last
    * byte report -1 on an empty payload in BOTH engines, so the oracle
    * holds on any corpus, not just the current fixtures. The float
    * feature vector itself stays un-hashed — it is strides/n_bytes,
    * fully determined by the verified integers. */
  val q37MediaFeatures: QueryDef = sql(
    "q37_media_features",
    """WITH b AS (SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
      |    text, octet_length(encode(text)) AS n_bytes
      |  FROM documents),
      |s AS (SELECT doc_id, media_type, n_bytes,
      |    CASE WHEN n_bytes = 0 THEN -1 ELSE ascii(substr(text, 1, 1)) END AS first_byte,
      |    CASE WHEN n_bytes = 0 THEN -1 ELSE ascii(substr(text, n_bytes, 1)) END AS last_byte,
      |    [coalesce(list_sum([ascii(substr(text, i + 1, 1)) FOR i IN range(j, n_bytes, 8)]), 0)
      |     FOR j IN range(0, 8)] AS strides
      |  FROM b)
      |SELECT doc_id, media_type, n_bytes, first_byte, last_byte,
      |  CAST(list_sum(strides) AS BIGINT) AS byte_sum,
      |  array_to_string(strides, ' ') AS stride_sums
      |FROM s ORDER BY doc_id""") { (s, d) =>
    import s.implicits._
    decodeWithHeader(mediaTable(s, d).as[MediaRow]).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        col("first_byte"), col("last_byte"), col("byte_sum"),
        array_join(col("strides"), " ").as("stride_sums"))
      .orderBy(col("doc_id"))
  }

  final case class FrameSamples(
      doc_id: Long, n_frames: Int, frame_idx: String, frame_sums: String)

  /** Frame SAMPLING with real byte access — the video-pipeline shape
    * (ffmpeg keyframe grab, CLIP frame embedding) on the opaque binary
    * column: a "frame" is a 16-byte block, the sampler touches ONLY the
    * first / middle / last frames' bytes (a real decoder seeks exactly
    * the same way — the point of sampling is to NOT read the payload),
    * and emits per-frame byte sums. Batched `mapPartitions` like q37;
    * payloads never shuffle; duplicates in the sample plan (1- and
    * 2-frame payloads) are kept, deterministic and mirrored. Every
    * output is exact integer arithmetic on payload bytes, mirrored
    * position-for-position by the oracle (ASCII corpus ⇒ char codes are
    * payload bytes — the oracle relies on it, the Spark side does not);
    * frames are complete by construction (n = len div 16), so no
    * partial-frame edge exists for engines to disagree on. */
  val q100MediaFrames: QueryDef = sql(
    "q100_media_frames",
    """WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n_bytes
      |           FROM documents WHERE doc_id % 3 = 2),
      |f AS (SELECT doc_id, text, CAST(n_bytes // 16 AS INT) AS n_frames
      |      FROM b),
      |x AS (SELECT doc_id, text, n_frames,
      |    CASE WHEN n_frames = 0 THEN CAST([] AS INT[])
      |         ELSE [0, n_frames // 2, greatest(n_frames - 1, 0)]
      |    END AS fidx
      |  FROM f),
      |s AS (SELECT doc_id, n_frames, fidx,
      |    [CAST(list_sum([ascii(substr(text, i * 16 + k + 1, 1))
      |                    FOR k IN range(0, 16)]) AS BIGINT)
      |     FOR i IN fidx] AS fsums
      |  FROM x)
      |SELECT doc_id, n_frames,
      |  array_to_string(fidx, ' ') AS frame_idx,
      |  array_to_string(fsums, ' ') AS frame_sums
      |FROM s ORDER BY doc_id""") { (s, d) =>
    import s.implicits._
    mediaTable(s, d).filter(col("media_type") === "video")
      .select(col("doc_id"), col("media_type"), col("content"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val n = r.content.length / 16
          val idx =
            if (n == 0) Array.empty[Int]
            else Array(0, n / 2, math.max(n - 1, 0))
          val sums = idx.map { i =>
            var acc = 0L
            var k = i * 16
            val end = k + 16
            while (k < end) { acc += (r.content(k) & 0xff); k += 1 }
            acc
          }
          FrameSamples(r.doc_id, n, idx.mkString(" "), sums.mkString(" "))
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  def all: Seq[QueryDef] = Seq(q36MediaMeta, q37MediaFeatures, q100MediaFrames)
}
