package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SetFunctions.sortedIntersectCount

/** The codegen two-pointer multiset intersection (`SortedIntersectCount`)
  * against its contract: equal to the equi-join row count of the two
  * (id, value) row sets — run products on duplicate values, not the
  * distinct-value overlap — plus interpreted/codegen parity and edge
  * shapes (empty, disjoint, all-equal).
  */
class SortedIntersectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def count(a: Seq[Long], b: Seq[Long]): Long =
    Seq((a.sorted, b.sorted)).toDF("a", "b")
      .select(sortedIntersectCount(col("a"), col("b")).as("n"))
      .head().getLong(0)

  /** the reference semantics: join-row count = Σ over values of
    * multiplicity products. */
  private def joinCount(a: Seq[Long], b: Seq[Long]): Long = {
    val bc = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    a.map(v => bc.getOrElse(v, 0L)).sum
  }

  test("equals the equi-join row count, including duplicate-value runs") {
    val cases = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq(1L, 1L, 2L), Seq(1L, 1L, 1L, 3L)), // 2×3 run product = 6
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(5L), Seq.empty[Long]),
      (Seq(7L, 7L, 7L), Seq(7L, 7L)), // 3×2 = 6
      (Seq(-3L, 0L, 9L), Seq(1L, 2L, 8L)), // disjoint
      (Seq(Long.MinValue, 0L, Long.MaxValue),
        Seq(Long.MinValue, Long.MaxValue)))
    cases.foreach { case (a, b) =>
      assert(count(a, b) == joinCount(a, b), s"mismatch for ($a, $b)")
      assert(count(b, a) == joinCount(b, a), s"asymmetric for ($b, $a)")
    }
  }

  test("interpreted eval matches codegen over random multisets") {
    val rnd = new scala.util.Random(20260814L)
    val rows = (0 until 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(12).toLong).sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(12).toLong).sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        sortedIntersectCount(col("a"), col("b")).as("n"))
    // codegen path (whole-stage) vs the same expression interpreted
    val codegen = df.collect().map(_.getLong(2))
    val expected = rows.map { case (a, b) => joinCount(a, b) }
    assert(codegen.toSeq == expected)
  }
}
