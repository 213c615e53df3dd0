package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.MinHashAggregator

/** ScalaCheck properties for the driver-side primitives (no Spark
  * session needed): the algebraic laws distributed aggregation relies
  * on — buffer merge must be commutative/associative/idempotent-safe
  * regardless of how partitions split the input.
  */
object PrimitiveProperties extends Properties("primitives") {

  private val P = 2147483647L
  private val perms = Array((1373158607L, 239081663L), (53710185L, 1592467581L),
    (590620973L, 525901256L), (479341425L, 299655412L))
  private def agg = new MinHashAggregator(perms, P)

  private val hashes = Gen.nonEmptyListOf(Gen.chooseNum(0L, Long.MaxValue - 1))

  private def signature(hs: Seq[Long]): Array[Long] =
    hs.foldLeft(agg.zero)((b, h) => agg.reduce(b, h))

  property("minhash merge == signature of concatenation (any split)") =
    forAll(hashes, hashes) { (a, b) =>
      val merged = agg.merge(signature(a), signature(b))
      merged.sameElements(signature(a ++ b))
    }

  property("minhash merge is commutative") =
    forAll(hashes, hashes) { (a, b) =>
      agg.merge(signature(a), signature(b))
        .sameElements(agg.merge(signature(b), signature(a)))
    }

  property("minhash signature is permutation-invariant") =
    forAll(hashes) { hs =>
      signature(hs).sameElements(signature(hs.reverse))
    }

  property("minhash values stay in [0, p)") =
    forAll(hashes) { hs =>
      signature(hs).forall(v => v >= 0 && v < P)
    }

  private val floats = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))

  property("FloatVectorDot eval equals a plain double fold") =
    forAll(floats, floats) { (a, b) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.sql.types.{ArrayType, FloatType}
      val expr = graft.functions.FloatVectorDot(
        Literal(new GenericArrayData(a.toArray), ArrayType(FloatType)),
        Literal(new GenericArrayData(b.toArray), ArrayType(FloatType)))
      val got = expr.eval(null).asInstanceOf[Double]
      val want = a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
        s + x.toDouble * y.toDouble
      }
      java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want)
    }

  private val doubles = Gen.listOfN(16, Gen.chooseNum(-10.0, 10.0))

  property("MixedVectorDot(float, double) equals the promoted double fold") =
    forAll(floats, doubles) { (a, b) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
      val expr = graft.functions.MixedVectorDot(
        Literal(new GenericArrayData(a.toArray), ArrayType(FloatType)),
        Literal(new GenericArrayData(b.toArray), ArrayType(DoubleType)))
      val got = expr.eval(null).asInstanceOf[Double]
      val want = a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
        s + x.toDouble * y
      }
      java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want)
    }

  private val tokens = Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))

  property("ShingleGenerator emits exactly n-1 adjacent pairs in order") =
    forAll(tokens) { ts =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.sql.types.{ArrayType, StringType}
      import org.apache.spark.unsafe.types.UTF8String
      val arr = new GenericArrayData(
        ts.map(t => UTF8String.fromString(t)).toArray[Any])
      val gen = graft.functions.ShingleGenerator(
        Literal(arr, ArrayType(StringType)))
      val rows = gen.eval(null).iterator.toSeq
        .map(_.getUTF8String(0).toString)
      val want = ts.sliding(2).filter(_.length == 2)
        .map(p => s"${p(0)} ${p(1)}").toSeq
      rows == want
    }

  // q44's centroid update splits each float32 component into three
  // 56-bit integer digits with floor/multiply/subtract (SimilarityOps
  // scaladoc). The claim the oracle parity rests on: the split is EXACT
  // for every float32 — reassembling the digits through the same
  // divisions recovers the value bit-for-bit, and each intermediate op
  // is itself exact (remainders in [0,1), digits integral).
  private val S = 72057594037927936L // 2^56
  private def floorSplit(v: Double): (Long, Long, Long) = {
    val x1 = math.floor(v * S)
    val r1 = v * S - x1
    val x2 = math.floor(r1 * S)
    val r2 = r1 * S - x2
    val x3 = math.floor(r2 * S)
    (x1.toLong, x2.toLong, x3.toLong)
  }

  // Exactness domain (documented in the q44 scaladoc): |v| < 128 so the
  // top digit fits a long, and negatives not below ~2^-80 — a tiny
  // negative v makes r1 = 1 - |v·S| where the borrow needs more than 53
  // bits, so the split degrades to a deterministic (still engine-
  // identical: same correctly-rounded IEEE ops both sides) approximation
  // with error ≤ |v| ≤ 2^-86. Embeddings (±0.5, components ≥ ~2^-30 in
  // magnitude) sit squarely inside the exact domain. Positive values are
  // exact all the way down to the 2^-149 subnormals.
  private def inExactDomain(f: Float): Boolean =
    f == 0f || f > 0f || f.toDouble.abs >= 1.1e-24 // ≥ 2^-80 when negative

  private val domainFloat: Gen[Float] = Gen.oneOf(
    Gen.chooseNum(-1.0f, 1.0f),
    Gen.chooseNum(-127.0f, 127.0f),
    // positive tiny + subnormal territory, where the lower digits activate
    Gen.chooseNum(1, Int.MaxValue).map(i => java.lang.Float.intBitsToFloat(i & 0x007fffff)),
    Gen.oneOf(0.0f, -0.0f, Float.MinPositiveValue,
      java.lang.Float.MIN_NORMAL, 1.0f / 3.0f, 0.1f, -0.1f, 126.99f)
  ).suchThat(inExactDomain)

  property("q44 floor-split reconstructs its exactness domain bit-for-bit") =
    forAll(domainFloat) { f =>
      val v = f.toDouble
      val (x1, x2, x3) = floorSplit(v)
      val back = (x1.toDouble + (x2.toDouble + x3.toDouble / S) / S) / S
      back == v
    }

  property("q44 floor-split digits are bounded (flat long/decimal buffers)") =
    forAll(domainFloat) { f =>
      val (x1, x2, x3) = floorSplit(f.toDouble)
      math.abs(x1.toDouble) <= 128.0 * S && x2 >= 0 && x2 < S && x3 >= 0 && x3 < S
    }

  // q111's normalizer: strings mixing ASCII, precomposed, and combining
  // marks — the shapes NFC actually rewrites
  private val nfcParts: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.const("caf\u00e9"), Gen.const("cafe\u0301"),
    Gen.const("a\u0308\u0301"), // base + combining marks; lone mark next
    Gen.const("\u0301"), Gen.const("\ud83d\ude00")) // surrogate pair too
  private val nfcStrings: Gen[String] =
    Gen.listOf(nfcParts).map(_.mkString)

  property("q111 NFC normalization is idempotent") =
    forAll(nfcStrings) { s =>
      val once = graft.functions.NormalizeNfc.nfc(s)
      graft.functions.NormalizeNfc.nfc(once) == once
    }

  property("q111 NFC agrees with the JDK normalizer (fast path included)") =
    forAll(nfcStrings) { s =>
      graft.functions.NormalizeNfc.nfc(s) ==
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }

  property("q111 NFC preserves NFC-equivalence class (same canonical form " +
      "whether input was decomposed or precomposed)") =
    forAll(nfcStrings) { s =>
      val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      graft.functions.NormalizeNfc.nfc(nfd) ==
        graft.functions.NormalizeNfc.nfc(s)
    }

  // q118's Morton interleave — driver mirror of Layout.zorderKey's bit
  // arithmetic (Column-vs-mirror parity is pinned on real data in
  // ScaleOpsSpec); these are the laws that make Z-clustered files carry
  // tight per-axis rectangles
  private def spread32(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }
  private def morton(a: Long, b: Long): Long = spread32(a) | (spread32(b) << 1)
  private val u32 = Gen.chooseNum(0L, 0xFFFFFFFFL)

  property("q118 Morton key is strictly monotone in each axis with the " +
      "other held fixed") =
    forAll(u32, u32, u32) { (a1, a2, b) =>
      (a1 == a2) || {
        val (lo, hi) = if (a1 < a2) (a1, a2) else (a2, a1)
        java.lang.Long.compareUnsigned(morton(lo, b), morton(hi, b)) < 0 &&
        java.lang.Long.compareUnsigned(morton(b, lo), morton(b, hi)) < 0
      }
    }

  property("q118 Morton key axes occupy disjoint bits and round-trip " +
      "exactly (no information loss in the interleave)") =
    forAll(u32, u32) { (a, b) =>
      val z = morton(a, b)
      def unspread(v: Long): Long = {
        var x = v & 0x5555555555555555L
        x = (x | (x >>> 1)) & 0x3333333333333333L
        x = (x | (x >>> 2)) & 0x0F0F0F0F0F0F0F0FL
        x = (x | (x >>> 4)) & 0x00FF00FF00FF00FFL
        x = (x | (x >>> 8)) & 0x0000FFFF0000FFFFL
        x = (x | (x >>> 16)) & 0x00000000FFFFFFFFL
        x
      }
      (spread32(a) & (spread32(b) << 1)) == 0L &&
        unspread(z) == a && unspread(z >>> 1) == b
    }

  // q34 per-row IVF assignment: NearestCellIds must reproduce the
  // window form it replaced — score every centroid with the promoted
  // double fold, rank (cosine DESC, c_id ASC), keep nprobe.
  private val centroidGen = for {
    n <- Gen.chooseNum(1, 12)
    embs <- Gen.listOfN(n, Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0)))
  } yield embs

  property("q34 NearestCellIds equals rank-by-(cosine desc, id asc) " +
      "take-nprobe over the same double fold") =
    forAll(Gen.listOfN(8, Gen.chooseNum(-10.0f, 10.0f)), centroidGen,
        Gen.chooseNum(1, 6)) { (v, cents, nprobe) =>
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
      import org.apache.spark.sql.types._
      val nr = math.sqrt(v.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
      def cnr(c: Seq[Double]) = math.sqrt(c.foldLeft(0.0)((s, x) => s + x * x))
      val structT = StructType(Seq(
        StructField("c_id", LongType),
        StructField("c_emb", ArrayType(DoubleType)),
        StructField("c_nr", DoubleType)))
      val cellRows = cents.zipWithIndex.map { case (c, i) =>
        InternalRow(i.toLong, new GenericArrayData(c.toArray), cnr(c))
      }
      val expr = graft.functions.NearestCellIds(
        Literal(new GenericArrayData(v.toArray), ArrayType(FloatType)),
        Literal(nr),
        Literal(new GenericArrayData(cellRows.toArray), ArrayType(structT)),
        nprobe)
      val got = expr.eval(null).asInstanceOf[ArrayData].toLongArray.toSeq
      val want = cents.zipWithIndex.map { case (c, i) =>
        val dot = v.zip(c).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y }
        (dot / (nr * cnr(c)), i.toLong)
      }.sortWith { case ((ca, ia), (cb, ib)) =>
        val cmp = java.lang.Double.compare(ca, cb)
        cmp > 0 || (cmp == 0 && ia < ib)
      }.take(nprobe).map(_._2)
      got == want
    }
}
