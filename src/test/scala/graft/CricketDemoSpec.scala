package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{CricketDemo, CricketEtl}

/** The generated demo corpus behind q60-q62: pins the properties the
  * DuckDB oracles assume about the ETL output, so a generator or ETL
  * change that silently breaks an oracle precondition fails here first.
  */
class CricketDemoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  private lazy val deliv = CricketDemo.deliveries(spark)

  test("corpus is mixed-version and nontrivial: 16 matches including " +
      "both v1.0.0 files, thousands of deliveries, no null endpoints") {
    val matches = deliv.select("matchId").distinct().collect()
      .map(_.getString(0)).sorted
    assert(matches.length == 16)
    assert(matches.contains("dm005") && matches.contains("dm011"),
      "v1.0.0-format matches missing from the deliveries table")
    assert(deliv.count() > 3000)
    assert(deliv.filter(col("batter").isNull || col("bowler").isNull)
      .count() == 0)
  }

  test("FACED MERGE key is unique in the demo corpus, so facedEdges " +
      "equals the filtered deliveries (the q62 oracle's precondition)") {
    val dupKeys = CricketEtl.validDeliveries(deliv)
      .groupBy(col("matchId"), col("innings"), col("over"),
        coalesce(col("ball"), lit(-1)), col("batter"), col("bowler"))
      .count().filter(col("count") > 1).count()
    assert(dupKeys == 0, s"$dupKeys duplicate MERGE keys in demo corpus")
    val faced = CricketEtl.facedEdges(deliv, lit(0)).count()
    val valid = CricketEtl.validDeliveries(deliv).count()
    assert(faced == valid, s"facedEdges dedup dropped rows: $faced != $valid")
  }

  test("v1.0.0 scalar runs and single-wicket dicts survived the " +
      "polymorphic decode (nonzero runs and wickets in dm005/dm011)") {
    val v10 = deliv.filter(col("matchId").isin("dm005", "dm011"))
    assert(v10.agg(sum("runs_total")).head.getLong(0) > 0,
      "v1.0 scalar runs decoded to zero")
    assert(v10.filter(size(col("wickets")) > 0).count() > 0,
      "v1.0 single-dict wickets decoded to empty")
  }
}
