package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** q55 (asymmetric containment pairs) against a driver-side brute force
  * over the same capped shingle sets, and q56 (int8 quantization)
  * against its mathematical invariants.
  */
class ContainmentQuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private val sf = "/root/testdata/sf0.001"

  test("q55 containment pairs match a driver-side brute force exactly " +
      "(same capped shingle sets, all pairs, threshold 0.8)") {
    // the same front-end the query uses; brute-forcing the PAIR logic
    // is the point — 50 docs at sf0.001 is driver-trivial
    val sets: Map[Long, Set[String]] = TextOps.shingleIndexPlan(spark, sf)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rows) => id -> rows.map(_.getAs[String]("tok")).toSet }
    val ids = sets.keys.toSeq.sorted
    val expected: Map[(Long, Long), Double] = (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      d1 = ids(i); d2 = ids(j)
      inter = (sets(d1) & sets(d2)).size
      c = inter.toDouble / math.min(sets(d1).size, sets(d2).size)
      if c >= 0.8
    } yield (d1, d2) ->
      BigDecimal(c).setScale(6, RoundingMode.HALF_UP).toDouble).toMap

    val got: Map[(Long, Long), Double] =
      SparkEntry.queries("q55_containment")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    assert(got == expected,
      s"missing=${(expected.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- expected.keySet).take(5)}")
    assert(expected.nonEmpty, "degenerate fixture: no containment pairs")
  }

  test("q27/q55 path gate: the prefix-filter plan and the count-shuffle " +
      "plan produce identical relations (both orders of the gate)") {
    // at fixture scale the gate picks the count path; force BOTH paths
    // and compare row-for-row, so the above-knee plan stays verified at
    // every sf even though only the sf1 sweep selects it naturally
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val sf001 = "/root/testdata/sf0.001"
    assert(rows(graft.operators.TextOps.jaccardPrefixPath(spark, sf001)) ==
      rows(graft.operators.TextOps.jaccardCountPath(spark, sf001)))
    assert(rows(graft.operators.TextOps.containmentPrefixPath(spark, sf001)) ==
      rows(graft.operators.TextOps.containmentCountPath(spark, sf001)))
    assert(graft.operators.TextOps.pairVolume(spark, sf001) > 0)
  }

  test("q27/q55 disk tier: the wave-staged scan (forced to 3 token-hash " +
      "waves) equals the single-job relation row for row") {
    // the PairDiskKnee gate only fires past any verified sf, so force
    // the wave machinery here: 3 waves at fixture scale must reproduce
    // the count-path relation exactly (disjoint token classes cover the
    // index; cross-wave duplicate pairs collapse in the final distinct)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val sf001 = "/root/testdata/sf0.001"
    assert(rows(graft.operators.TextOps.jaccardStagedPath(spark, sf001, 3)) ==
      rows(graft.operators.TextOps.jaccardCountPath(spark, sf001)))
    assert(rows(graft.operators.TextOps.containmentStagedPath(spark, sf001, 3)) ==
      rows(graft.operators.TextOps.containmentCountPath(spark, sf001)))
  }

  test("wave retry-split invariant: the two half-waves (i, 2w) and " +
      "(i+w, 2w) union to exactly the parent wave (i, w)") {
    // the ENOSPC retry path in stagedPairScan replaces wave (i, w) with
    // its two mod-2w refinements; pin that the refinement is lossless
    // and non-overlapping for every parent wave of a 2-wave split
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sf001 = "/root/testdata/sf0.001"
    (0 until 2).foreach { i =>
      val parent = rows(TextOps.jaccardPrefixWave(spark, sf001, i, 2))
      val halves = rows(TextOps.jaccardPrefixWave(spark, sf001, i, 4)) ++
        rows(TextOps.jaccardPrefixWave(spark, sf001, i + 2, 4))
      assert(halves == parent, s"wave ($i, 2) != its mod-4 refinement")
    }
  }

  test("wave spill model self-corrects mid-staging: a too-small disk " +
      "preemptively splits wave 1 (no ENOSPC), the wave-1 telemetry " +
      "re-solves F-hat, and later waves stop splitting") {
    // forced-small-disk via the injectable usableSpace: with the frozen
    // F prior (50 GB) and 62.5 GB "free", predicted(w=2) = 50.75 GB
    // exceeds usable - margin = 50.5 GB, so wave (0, 2) must split
    // preemptively into (0, 4) + (2, 4); the fixture's measured peak
    // then re-solves F-hat down to the 1 GB floor, so wave (1, 2) fits
    // and runs UNSPLIT — the mid-staging W revision, with zero failed
    // (ENOSPC) waves. The staged result must still equal the plain
    // count-path relation (the revision is lossless).
    val sf001 = "/root/testdata/sf0.001"
    val calls = scala.collection.mutable.Buffer[(Int, Int)]()
    val staged = TextOps.stagedPairScan(spark, sf001,
        s"spec_preempt_${System.nanoTime}", waves = 2,
        pairRows = 1L << 27, bytesPerPair = 12L,
        usableSpace = () => 125L << 29) { (i, w) =>
      calls += ((i, w))
      TextOps.jaccardPrefixWave(spark, sf001, i, w)
    }
    assert(calls.toList == List((0, 4), (2, 4), (1, 2)),
      s"expected preemptive split of wave 0 only, got $calls")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(staged) ==
      rows(graft.operators.TextOps.jaccardCountPath(spark, sf001)))
  }

  test("wave-count objective: per-family throughput target picks the " +
      "measured optimum, disk stays a hard bound, cap guards the fixed " +
      "costs") {
    // the sf10 A/B numbers as arithmetic, at the LIVE planner volume
    // pv = 3.7e9 pairs (r14 corrected the r13 calibration, which
    // assumed pv*bpp ~ 120 GB; live containment pv*bpp = 88.8 GB, and
    // at the old 6 GiB target the planner chose w = 14 - a leg the A/B
    // measured at 980.8 s vs 716.0 at w = 20): containment at
    // 4 GiB/wave -> w = 21, inside the measured 20-22 optimum band;
    // jaccard (pv*bpp = 44.4 GB) at 12 GiB/wave -> w = 4, at its
    // measured optimum ~4.8. Disk stays a hard bound; the cap guards
    // a 100x pv.
    val gb = 1L << 30
    val pv = 3700000000L
    val roomy = () => 200L * gb
    assert(TextOps.pairWaves(pv, TextOps.ContainmentSpillBytesPerPair,
      TextOps.ContainmentWaveTargetBytes, roomy, scaledPrior = true) == 21)
    assert(TextOps.pairWaves(pv, TextOps.PairSpillBytesPerPair,
      TextOps.JaccardWaveTargetBytes, roomy) == 4)
    // containment's scaled-prior disk bound: per-wave footprint is
    // wave bytes + F(wave) ~ 4.5*pv*bpp/w (see containmentFixedPrior),
    // so at 25 GB usable (13 GiB over the margin) the bound
    // ceil(4.5*88.8 GB / 13 GiB) = 29 exceeds the throughput 21 and wins
    assert(TextOps.pairWaves(pv, TextOps.ContainmentSpillBytesPerPair,
      TextOps.ContainmentWaveTargetBytes, () => 25L * gb,
      scaledPrior = true) == 29)
    // jaccard keeps the frozen-prior headroom model (its measured F is
    // wave-size-insensitive at 25-45 GB): at 63 GB usable the headroom
    // floors at 4 GiB and the disk minimum ceil(44.4 GB / 4 GiB) = 11
    // exceeds the throughput 4
    assert(TextOps.pairWaves(pv, TextOps.PairSpillBytesPerPair,
      TextOps.JaccardWaveTargetBytes, () => 63L * gb) == 11)
    // 100x the pair volume, roomy disk: throughput W would be 2068,
    // the cap holds it at 64 on a huge scratch volume; at 200 GB the
    // scaled-prior disk bound (198) still overrides the cap - the
    // bound is never relaxed
    assert(TextOps.pairWaves(100L * pv,
      TextOps.ContainmentSpillBytesPerPair,
      TextOps.ContainmentWaveTargetBytes,
      () => 4000L * gb, scaledPrior = true) == 64)
    assert(TextOps.pairWaves(100L * pv,
      TextOps.ContainmentSpillBytesPerPair,
      TextOps.ContainmentWaveTargetBytes, roomy, scaledPrior = true) == 198)
  }

  test("containment wave-1 spill prior scales with the wave, covering " +
      "every measured (wave-bytes, peak) point") {
    val gb = 1L << 30
    // measured F at sf10 (WAVE_AB_r13 + the r14 registered staging),
    // decimal bytes: (wave planner bytes pv*bpp/w at pv*bpp = 88.8e9,
    // max observed F = peak - wave bytes) - the prior must cover each
    val points = Seq(
      (12686000000L, 37714000000L), // w=7:   peaks up to 50.4e9
      (8880000000L, 22820000000L),  // w=10:  peaks up to 31.7e9
      (6343000000L, 13757000000L),  // w=14:  peaks up to 20.1e9
      (4440000000L, 8060000000L),   // w=20:  peaks up to 12.5e9
      (3171000000L, 8929000000L),   // w=28:  peaks up to 12.1e9
      (529000000L, 2270000000L),    // w=168: re-solved F-hat 2.27e9
      (4229000000L, 13510000000L))  // w=21 wave 0, JVM-cold (r14 run)
    points.foreach { case (waveBytes, maxF) =>
      val prior = TextOps.containmentFixedPrior(waveBytes)
      assert(prior >= maxF,
        s"prior $prior does not cover measured F $maxF at $waveBytes")
    }
    // floor and cap
    assert(TextOps.containmentFixedPrior(1L << 20) == (3L << 30))
    assert(TextOps.containmentFixedPrior(100L * gb) == (50L << 30))
    // and it must NOT fire the preemptive split on the r14 scenario the
    // frozen prior broke: a 4.4 GB-wave plan on a 62 GB-usable disk
    // (prior + wave <= usable - margin)
    val wave = 4440000000L
    assert(TextOps.containmentFixedPrior(wave) + wave <=
      62L * gb - (12L << 30))
  }

  test("q55 reports size-mismatched pairs that symmetric Jaccard scores " +
      "strictly lower (containment > jaccard whenever |A| != |B|)") {
    val sizes: Map[Long, Int] = TextOps.shingleIndexPlan(spark, sf)
      .collect().groupBy(_.getAs[Long]("doc_id")).map { case (id, r) => id -> r.length }
    val rows = SparkEntry.queries("q55_containment")(spark, sf).collect()
    rows.foreach { r =>
      val (d1, d2, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (n1, n2) = (sizes(d1), sizes(d2))
      val lo = math.min(n1, n2).toDouble
      // jac = inter / (n1 + n2 - inter) <= inter / max >= relation:
      // containment uses min in the denominator, so it weakly dominates
      val inter = c * lo // recover |A∩B| (pre-rounding, tolerance below)
      val jac = inter / (n1 + n2 - inter)
      assert(c >= jac - 1e-9, s"pair ($d1,$d2): containment $c < jaccard $jac")
    }
  }

  test("q56 int8 quantization invariants: range, peak saturation, " +
      "round-trip error bound, zero-vector guard") {
    val rows: Array[Row] =
      SparkEntry.queries("q56_quantize_int8")(spark, sf).collect()
    assert(rows.nonEmpty)
    val emb: Map[Long, Seq[Float]] = graft.sources.Tables.embeddings(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val mx = r.getDouble(1)
      val qv = r.getString(2).split(',').toSeq.filter(_.nonEmpty).map(_.toInt)
      val v = emb(id)
      assert(qv.length == v.length)
      if (mx == 0.0) {
        assert(qv.forall(_ == 0), s"vec $id: zero vector must quantize to zeros")
      } else {
        assert(qv.forall(q => q >= -127 && q <= 127),
          s"vec $id: quantized value outside [-127, 127]")
        assert(qv.map(math.abs).max == 127,
          s"vec $id: peak element must saturate to ±127")
        val scale = 127.0 / mx
        v.zip(qv).foreach { case (x, q) =>
          val err = math.abs(q / scale - x.toDouble)
          assert(err <= 0.5 / scale + 1e-12,
            s"vec $id: round-trip error $err exceeds half-step ${0.5 / scale}")
        }
      }
    }
  }
}
