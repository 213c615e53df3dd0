package graft

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Streaming smoke: the file-source → transform → memory-sink path, with
  * results cross-checked against the batch-verified equivalents.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  /** stream sources need a directory; stage the sf0.001 events file. */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("events_stream")
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("windowed streaming aggregation matches the batch plan") {
    val stream = StreamingOps.eventStream(spark, eventsDir)
    val out = StreamingOps.runToMemory(
      StreamingOps.windowedCounts(stream), "win_out", OutputMode.Complete).df
    val got = out.select(sum("n").cast("long")).collect().head.getLong(0)
    val batchCount = spark.read
      .schema(StreamingOps.rawSchema).parquet(eventsDir).count()
    assert(got == batchCount)
    assert(out.count() > 0)
  }

  test("dropDuplicatesWithinWatermark removes duplicate event_ids") {
    val stream = StreamingOps.eventStream(spark, eventsDir)
    val doubled = stream.union(stream) // every event twice
    val n = StreamingOps.runToMemory(
      StreamingOps.dedupedStream(doubled), "dedup_out").df.count()
    val distinctIds = spark.read.schema(StreamingOps.rawSchema)
      .parquet(eventsDir).select("event_id").distinct().count()
    assert(n == distinctIds)
  }

  test("mapGroupsWithState accumulates running per-user totals") {
    val stream = StreamingOps.eventStream(spark, eventsDir)
    val out = StreamingOps.runToMemory(
      StreamingOps.runningUserTotals(stream).toDF(), "state_out",
      OutputMode.Update).df
    // the final update per user matches the batch group-by
    val lastPerUser = out.groupBy("user_id").agg(max("n").as("n"))
    val batch = spark.read.schema(StreamingOps.rawSchema).parquet(eventsDir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(lastPerUser.join(batch, Seq("user_id"))
      .filter(lastPerUser("n") =!= batch("n")).count() == 0)
  }

  test("flatMapGroupsWithState emits exactly floor(total/step) alerts per user") {
    val stream = StreamingOps.eventStream(spark, eventsDir)
    val alerts = StreamingOps.runToMemory(
      StreamingOps.thresholdAlerts(stream, step = 50.0).toDF(), "alerts_out",
      OutputMode.Append).df
    val got = alerts.groupBy("user_id").agg(count(lit(1)).as("n_alerts"))
    // monotone accumulator → alert count is batch-boundary-independent:
    // floor(sum(|value|)/step) per user
    val expected = spark.read.schema(StreamingOps.rawSchema)
      .parquet(eventsDir)
      .groupBy("user_id")
      .agg(floor(sum(abs(col("value"))) / 50.0).as("expected"))
      .filter(col("expected") > 0)
    assert(alerts.count() > 0)
    assert(expected.join(got, Seq("user_id"), "left")
      .filter(coalesce(col("n_alerts"), lit(0L)) =!= col("expected"))
      .count() == 0)
  }

  test("streaming executions equal their batch twins bit-for-bit " +
      "(q66~q17 tumbling, q67~q19 sessions; decimal state merge + " +
      "Append-mode sentinel-flushed drain)") {
    val sf = "/root/testdata/sf0.001"
    for ((sq, bq) <- Seq(
        "q66_stream_tumbling" -> "q17_events_tumbling",
        "q67_stream_session" -> "q19_events_session")) {
      val stream = SparkEntry.queries(sq)(spark, sf).collect().map(_.toSeq)
      val batch = SparkEntry.queries(bq)(spark, sf).collect().map(_.toSeq)
      assert(stream.nonEmpty)
      assert(stream.length == batch.length, s"$sq vs $bq row counts")
      stream.zip(batch).foreach { case (sRow, bRow) =>
        assert(sRow == bRow, s"$sq row $sRow != $bq row $bRow")
      }
    }
  }

  test("session windows produce at least one session per active user") {
    val stream = StreamingOps.eventStream(spark, eventsDir)
    val out = StreamingOps.runToMemory(
      StreamingOps.sessionCounts(stream), "sess_out", OutputMode.Complete).df
    val users = out.select("user_id").distinct().count()
    val batchUsers = spark.read.schema(StreamingOps.rawSchema)
      .parquet(eventsDir).select("user_id").distinct().count()
    assert(users == batchUsers)
  }

  test("Append-mode drains EVICT window/session state: final state-store " +
      "rows ≤ sentinel residue, never the emitted-window count") {
    val sf = "/root/testdata/sf0.001"
    val staged = StreamingOps.stageEventsWithSentinels(spark, sf)
    for ((name, plan) <- Seq[(String, org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame)](
        "wm_tumbling" -> StreamingOps.windowedCounts,
        "wm_session" -> StreamingOps.sessionCounts,
        // q96's sketch state: 512 HLL registers per window row must
        // evict on watermark advance exactly like the count state
        "wm_hll" -> ((df: org.apache.spark.sql.DataFrame) => df
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(approx_count_distinct(col("user_id"), 0.05)
            .as("approx_users"))))) {
      val drained = StreamingOps.runToMemory(
        plan(StreamingOps.eventStream(spark, staged, oneFilePerBatch = true)),
        s"state_evict_$name", OutputMode.Append)
      val emitted = drained.df.count()
      assert(emitted > 10, s"$name: expected many emitted windows")
      // mid-drain state peaks at the open windows, then the sentinel
      // advance closes and EVICTS them: only the (≤2) sentinel-own
      // windows/sessions may remain. Complete mode would leave `emitted`
      // rows resident (and re-emit them every trigger).
      assert(drained.finalStateRows <= 2,
        s"$name: state not evicted — ${drained.finalStateRows} rows remain " +
          s"after drain (emitted $emitted)")
      assert(drained.maxStateRows >= emitted - 2,
        s"$name: sanity — state should have held the open windows mid-drain")
    }
  }

  test("stream-stream interval join matches its batch twin and EVICTS " +
      "join state once the watermark clears the interval") {
    val sf = "/root/testdata/sf0.001"
    val got = StreamingOps.q81StreamIntervalJoin.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got.nonEmpty, "expected click→purchase pairs at sf0.001")
    // batch twin over the same loader
    val e = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("timestamp").as("tsu"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("tsu").as("cts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        col("tsu").as("pts"))
    val want = c.join(p, expr(
        "cu = pu AND pts >= cts AND pts <= cts + interval 1 hour"))
      .select(col("cu"), col("click_id"), col("purchase_id"),
        (unix_micros(col("pts")) - unix_micros(col("cts"))).as("lag_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want, s"stream pairs != batch pairs\n${got.diff(want)}" +
      s"\n${want.diff(got)}")
    // state eviction: rebuild the join raw to read the drain metrics —
    // the sentinel batches advance the watermark past all data, so the
    // buffered rows of BOTH sides are released; only (≤2) sentinel-epoch
    // residue may remain resident after the drain
    val staged = StreamingOps.stageEventsWithSentinels(spark, sf)
    // mirrors StreamingOps.joinSide: the type filter must let sentinel
    // rows through (Catalyst pushes it below the watermark operator)
    def side(tpe: String, uid: String, id: String, t: String) =
      StreamingOps.eventStream(spark, staged, oneFilePerBatch = true)
        .withWatermark("ts", "1 hour")
        .filter(col("event_type") === tpe ||
          col("event_type") === StreamingOps.SentinelType)
        .select(col("user_id").as(uid), col("event_id").as(id),
          col("ts").as(t))
    val drained = StreamingOps.runToMemory(
      side("click", "cu", "click_id", "cts").join(
        side("purchase", "pu", "purchase_id", "pts"),
        expr("cu = pu AND pts >= cts AND pts <= cts + interval 1 hour")),
      "ijoin_state_probe", OutputMode.Append)
    assert(drained.maxStateRows > 0,
      "sanity — the join must have buffered rows mid-drain")
    // the symmetric hash join's two per-side stores keep a few
    // bookkeeping rows; the point is the DATA buffers are gone
    assert(drained.finalStateRows <= 4 &&
        drained.finalStateRows < drained.maxStateRows / 10,
      s"join state not evicted — ${drained.finalStateRows} of peak " +
        s"${drained.maxStateRows} rows remain")
  }

  test("streaming funnel carries automaton state across event-time-ordered " +
      "micro-batches and equals batch q86 with constant per-user state") {
    val sf = "/root/testdata/sf0.01"
    // three tercile batches: conversions whose funnel spans batch
    // boundaries only emit if (lastView, bestStart) survive the crossing
    val staged = StreamingOps.stageEventsOrdered(spark, sf)
    assert(new java.io.File(staged).listFiles()
      .count(_.getName.endsWith(".parquet")) == 3)
    val drained = StreamingOps.runToMemory(
      StreamingOps.funnelHits(
        StreamingOps.eventStream(spark, staged, oneFilePerBatch = true),
        windowUs = 48L * 3600L * 1000000L).toDF(),
      "funnel_state_probe", OutputMode.Append)
    val got = drained.df.orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = graft.operators.EventOps.q86Funnel.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, s"streaming funnel diverged from batch twin")
    // state is one (lastView, bestStart, done) row per user seen — never
    // per-event: bounded by user cardinality at every micro-batch
    val nUsers = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(drained.maxStateRows <= nUsers,
      s"state ${drained.maxStateRows} rows exceeds user count $nUsers")
  }

  test("streaming quota admits exactly the first-N per key across batch " +
      "boundaries with one state row per key, never re-admitting") {
    val sf = "/root/testdata/sf0.01"
    val staged = StreamingOps.stageEventsOrdered(spark, sf)
    val drained = StreamingOps.runToMemory(
      StreamingOps.quotaAdmit(
        StreamingOps.eventStream(spark, staged, oneFilePerBatch = true),
        cap = 150).toDF(),
      "quota_state_probe", OutputMode.Append)
    val got = drained.df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // exactly-once: no event id emitted twice
    assert(got.map(_._2).distinct.length == got.length)
    // equals the batch first-150-per-type in (ts, event_id) order —
    // including types whose 150th and 151st events straddle a tercile
    // batch boundary (the cap carries as state, the 151st must drop)
    import org.apache.spark.sql.expressions.Window
    val want = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("us"), col("event_id"))))
      .filter(col("rn") <= 150)
      .select("event_type", "event_id", "us").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sorted.toSeq == want.sorted.toSeq,
      "admitted set diverges from the batch first-N")
    // state is ONE count per event_type — never per-event
    val nTypes = spark.read.parquet(s"$sf/events.parquet")
      .select("event_type").distinct().count()
    assert(drained.maxStateRows <= nTypes,
      s"state ${drained.maxStateRows} rows exceeds key count $nTypes")
  }

  test("feed-scaled state width: floor 4 at bench feeds, widens " +
      "linearly with the feed, caps at the session's cores (the " +
      "scale-out knob — see COVERAGE.md §2.H state posture)") {
    import StreamingOps.feedScaledStateWidth
    // bench-scale feeds sit on the measured floor (per-task state-store
    // open/commit overhead beats parallelism below the crossover)
    assert(feedScaledStateWidth(100000L, 1000000L, 32) == 4)
    assert(feedScaledStateWidth(955000L, 1000000L, 32) == 4)
    // a synthetic 10x feed (sf10's 10M events) widens to 10 partitions
    // at q67's 1M-rows/partition crossover, 20 at q73's 500k
    assert(feedScaledStateWidth(10000000L, 1000000L, 32) == 10)
    assert(feedScaledStateWidth(10000000L, 500000L, 32) == 20)
    // 100x the feed on the same box saturates the cores; on a cluster
    // defaultParallelism grows with the executors and the cap lifts,
    // holding rows-per-partition (per-task state size) constant
    assert(feedScaledStateWidth(100000000L, 1000000L, 32) == 32)
    assert(feedScaledStateWidth(100000000L, 1000000L, 1000) == 100)
    assert(feedScaledStateWidth(1000000000L, 1000000L, 1000) == 1000)
  }
}
