package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions.vecDot

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  /** the composable reference fold: aggregate(zip_with(...)). */
  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
    lit(0.0), (acc, v) => acc + v)

  test("codegen dot product is bit-identical to the higher-order fold") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val got = rows.toDF("a", "b")
      .select(vecDot(col("a"), col("b")).as("native"), hofDot.as("hof"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null array yields null; small exact case") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f)))).toDF("a", "b")
    val rows = df.select(vecDot(col("a"), col("b")).as("d")).collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
  }

  test("length mismatch yields null, matching the zip_with fold and oracle") {
    import graft.functions.VectorFunctions.vecDotAny
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b")
    val r = df.select(
      vecDot(col("a"), col("b")).as("native"),
      hofDot.as("hof")).collect().head
    assert(r.isNullAt(0), "native must be null on mismatched lengths")
    assert(r.isNullAt(1), "the composable fold is null too (zip_with pads)")
    val mixed = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0, 5.0)))
      .toDF("a", "b")
      .select(vecDotAny(col("a"), col("b")).as("d")).collect().head
    assert(mixed.isNullAt(0))
  }

  test("mixed float/double dot is bit-identical to the higher-order fold") {
    import graft.functions.VectorFunctions.vecDotAny
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(100)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val got = rows.toDF("a", "b")
      .select(vecDotAny(col("a"), col("b")).as("native"), hofDot.as("hof"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("array<double> inputs fail at analysis instead of returning garbage") {
    // getFloat over a double-backed ArrayData would reinterpret bytes;
    // checkInputDataTypes must reject before execution.
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(vecDot(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<float>"))
  }
}
