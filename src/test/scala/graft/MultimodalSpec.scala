package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.{MediaFeatures, MediaRow}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q37/q100 oracle precondition: the documents corpus is pure " +
      "ASCII at every driver sf (char positions == byte offsets)") {
    // the oracles index text by CHARACTER (ascii(substr(text, i, 1)))
    // while the Spark side sums raw UTF-8 bytes at byte offsets — they
    // agree iff every character is one byte. A regenerated corpus with
    // any multi-byte character would silently diverge; this makes the
    // assumption fail LOUDLY instead (ADVICE r8).
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { d =>
      val nonAscii = spark.read.parquet(s"$d/documents.parquet")
        .filter(octet_length(col("text")) =!= length(col("text")))
        .count()
      assert(nonAscii == 0L,
        s"$d: $nonAscii documents contain multi-byte characters — " +
          "q37/q100 oracles assume char positions are byte offsets")
    }
  }

  test("media table: binary payloads with typed metadata") {
    val m = MultimodalOps.mediaTable(spark, sf)
    assert(m.schema("content").dataType.typeName == "binary")
    val types = m.select("media_type").distinct()
      .as[String].collect().sorted
    assert(types.toSeq == Seq("audio", "image", "video"))
  }

  test("feature extraction is deterministic and partition-independent") {
    val media = MultimodalOps.mediaTable(spark, sf).as[MediaRow]
    val f1 = MultimodalOps.extractFeatures(media.repartition(1))
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    val f8 = MultimodalOps.extractFeatures(media.repartition(8))
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(f1 == f8)
    assert(f1.values.forall(_.length == 8))
  }

  test("decode stub computes stride byte averages") {
    val bytes = Array.tabulate[Byte](16)(i => i.toByte)
    val f = MultimodalOps.decodeStub(bytes)
    // stride k sums bytes k and k+8, divided by length 16
    assert(f(0) == (0 + 8) / 16.0f)
    assert(f(7) == (7 + 15) / 16.0f)
  }

  test("header decode conserves byte sums and reproduces the stub's features") {
    val media = MultimodalOps.mediaTable(spark, sf).as[MediaRow]
    val dec = MultimodalOps.decodeWithHeader(media).collect()
    assert(dec.length == 500)
    dec.foreach { r =>
      assert(r.strides.sum == r.byte_sum)
      assert(r.n_bytes > 0 && r.first_byte >= 0 && r.last_byte <= 255)
    }
    // the float features are exactly strides / n_bytes — i.e. the stub's
    // output, so the hashed integers fully determine the feature vector
    val stub = MultimodalOps.extractFeatures(media)
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    dec.foreach { r => assert(r.features.toSeq == stub(r.doc_id)) }
  }

  test("header decode handles short and empty payloads exactly as the " +
      "oracle's degenerate-case arithmetic") {
    val rows = Seq(
      MultimodalOps.MediaRow(0, "image", "abc".getBytes("UTF-8")),
      MultimodalOps.MediaRow(1, "audio", Array.emptyByteArray),
      MultimodalOps.MediaRow(5, "video", "xy".getBytes("UTF-8"))).toDS()
    val got = MultimodalOps.decodeWithHeader(rows)
      .collect().map(r => r.doc_id -> r).toMap
    assert(got(1).first_byte == -1 && got(1).last_byte == -1 &&
      got(1).byte_sum == 0L && got(1).strides.toSeq == Seq.fill(8)(0L))
    assert(got(0).strides.toSeq == Seq(97L, 98L, 99L, 0L, 0L, 0L, 0L, 0L))
    assert(got(5).first_byte == 120 && got(5).last_byte == 121 &&
      got(5).byte_sum == 241L)
  }

  test("frame sampling plan bounds indices to [0, n_frames)") {
    val plan = MultimodalOps.frameSamplePlan(
      MultimodalOps.mediaTable(spark, sf)).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val n = r.getAs[Int]("n_frames")
      assert(r.getAs[Int]("f_first") == 0)
      assert(r.getAs[Int]("f_mid") <= math.max(n - 1, 0))
      assert(r.getAs[Int]("f_last") == math.max(n - 1, 0))
    }
  }
}
