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
}
