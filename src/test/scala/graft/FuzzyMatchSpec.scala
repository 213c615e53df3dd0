package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** q48's two physical regimes must be the same relation: the broadcast
  * (map-side name probe) form and the beyond-broadcast shuffled-attach
  * form differ only in where the name strings travel — forcing both
  * knees to zero on the sf0.01 fixture pins row-for-row equality, so
  * the sf10 regime switch can never change the answer.
  */
class FuzzyMatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private val sf = "/root/testdata/sf0.01"

  test("shuffled-attach (above both knees) equals the broadcast regime " +
      "row-for-row") {
    val broadcastForm = TextOps
      .fuzzyMatchPlan(spark, sf, TextOps.FuzzyBroadcastKnee)
      .collect().map(_.toSeq).toSeq
    assert(broadcastForm.nonEmpty, "degenerate fixture: no fuzzy matches")
    val shuffledForm = TextOps
      .fuzzyMatchPlan(spark, sf, broadcastKnee = 0L, broadcastBytes = 0L)
      .collect().map(_.toSeq).toSeq
    assert(shuffledForm == broadcastForm,
      "shuffled name-attach regime diverges from the broadcast regime")
  }
}
