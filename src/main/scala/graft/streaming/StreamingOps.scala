package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.QueryDef

/** Structured-Streaming surface — SURVEY.md §2.H.
  *
  * The reference has no streaming (ingestion is an idempotent batch
  * re-run); this module is the declared extension: the same event
  * aggregations the batch queries verify (graft.operators.EventOps) run
  * unchanged over an unbounded source with a watermark. Batch-verified
  * semantics + streaming execution is exactly Structured Streaming's
  * unified-model contract.
  *
  * Scale posture: file-source streams parallelize per file split;
  * watermark bounds state (10-minute windows + 1-hour watermark keeps at
  * most ~70 minutes of window state per key); stateful ops shuffle once
  * on the group key and keep per-key state in the state store.
  */
object StreamingOps {

  /** The single part file of a one-partition parquet write. Closes the
    * directory stream (`Files.list` holds an open fd until closed —
    * staging calls would otherwise leak one descriptor each). */
  private def singlePartFile(tmp: String): java.nio.file.Path = {
    val stream = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
    try {
      stream.toArray.map(_.toString).filter(_.endsWith(".parquet"))
        .map(java.nio.file.Paths.get(_)).head
    } finally stream.close()
  }

  /** (mtime, size) fingerprint of a staging SOURCE file — the `_staged`
    * markers store it so a stage dir is reused only while its source is
    * byte-identical-in-place. The driver regenerates `/root/testdata`
    * between rounds without renaming, so a marker keyed on the sf dir
    * basename alone would serve stale splits. */
  private def srcFingerprint(src: java.nio.file.Path): String = {
    val f = src.toFile
    s"${f.lastModified}:${f.length}"
  }

  /** True when `done` exists and records `fp`. */
  private def stagedFresh(done: java.nio.file.Path, fp: String): Boolean =
    java.nio.file.Files.exists(done) &&
      new String(java.nio.file.Files.readAllBytes(done),
        java.nio.charset.StandardCharsets.UTF_8) == fp

  private def writeMarker(done: java.nio.file.Path, fp: String): Unit = {
    java.nio.file.Files.write(done,
      fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (): Unit
  }

  /** events schema as STAGED — every stream directory this module
    * writes holds the canonical µs TIMESTAMP_NTZ encoding (see
    * [[normalizedEvents]]), so file-source readers never branch on the
    * source's physical encoding. */
  val rawSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING")

  /** Batch read of the sf events file normalized to the canonical
    * schema. The driver's `events.parquet` has carried two physical
    * encodings across testdata generations (INT64 nanosecond epochs;
    * native µs TIMESTAMP) — probe the footer and normalize, exactly as
    * `sources.Tables.events` does (session tz pinned UTC keeps the
    * LTZ↔NTZ hop µs-exact). */
  private[graft] def normalizedEvents(
      spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read
      .parquet(java.nio.file.Paths.get(d, "events.parquet").toString)
    val ts =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      else col("ts").cast("timestamp_ntz")
    raw.withColumn("ts", ts)
  }

  /** Unbounded scan of an events directory (parquet file source).
    * `maxFilesPerTrigger=1` (when `oneFilePerBatch`) pins the
    * file→micro-batch mapping so a staged sentinel file (see
    * [[stageEventsWithSentinels]]) is guaranteed to land in a LATER
    * batch than the data it flushes. */
  def eventStream(spark: SparkSession, dir: String,
      oneFilePerBatch: Boolean = false): DataFrame = {
    val reader = spark.readStream.schema(rawSchema)
    val r2 = if (oneFilePerBatch) reader.option("maxFilesPerTrigger", "1")
             else reader
    // watermarks demand TIMESTAMP (not NTZ); session tz is pinned UTC,
    // so the cast is µs-exact and sinks cast back to NTZ for the oracle
    r2.parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Tumbling-window counts with late-data tolerance: the streaming twin
    * of the batch-verified q17 aggregation. The sum routes through the
    * same fixed-scale decimal as q17 (`Exact.sumd2`) — decimal streaming
    * state merges exactly, so the drained result is bit-identical to the
    * batch plan no matter how micro-batches split the input. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Exact.sumd2(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("sum_value"))

  /** Stateful dedup bounded by the watermark (exactly-once per event_id
    * within the lateness horizon). */
  def dedupedStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Session windows per user — streaming twin of batch q19, with the
    * same exact decimal sum so drained results match batch bit-for-bit. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Exact.sumd2(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n"), col("sum_value"))

  final case class UserTotal(user_id: Long, n: Long, total: Double)

  /** Custom keyed state via mapGroupsWithState: running per-user event
    * count + value total (the §2.I "custom state" ladder rung —
    * KeyValueGroupedDataset state, not a UDF).
    */
  def runningUserTotals(events: DataFrame): Dataset[UserTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { case (_, v) => n += 1; total += v }
          val next = UserTotal(uid, n, total)
          state.update(next)
          next
      }
  }

  final case class Alert(user_id: Long, crossed: Double, total: Double)

  /** Custom keyed state via flatMapGroupsWithState — the 0..N-outputs
    * shape `mapGroupsWithState` cannot express: emit one alert row each
    * time a user's running |value| total crosses another multiple of
    * `step`. The monotone accumulator makes the emitted-alert count
    * independent of micro-batch boundaries (floor(final/step) total),
    * which the spec exploits to verify against a batch aggregate.
    */
  def thresholdAlerts(events: DataFrame, step: Double = 50.0): Dataset[Alert] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), abs(col("value")).cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Double, Alert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[Double]) =>
          val prev = state.getOption.getOrElse(0.0)
          var total = prev
          rows.foreach { case (_, v) => total += v }
          state.update(total)
          val from = math.floor(prev / step).toLong
          val to = math.floor(total / step).toLong
          ((from + 1) to to).iterator.map(k => Alert(uid, k * step, total))
      }
  }

  final case class CentAlert(user_id: Long, k: Long)

  /** [[thresholdAlerts]] with EXACT integer state — the oracle-eligible
    * form: each event contributes its |value| quantized to cents through
    * the same DECIMAL(18,2) cast the batch aggregates use, the per-user
    * state is a plain long sum (order-independent, so micro-batch
    * boundaries cannot shift a crossing), and one alert row (user, k)
    * is emitted per `stepCents` multiple crossed. The drained sink is
    * therefore exactly {(u, k) : 1 ≤ k ≤ ⌊total_cents(u)/stepCents⌋} —
    * a closed-form batch aggregate both engines compute identically.
    */
  def thresholdAlertsCents(
      events: DataFrame, stepCents: Long): Dataset[CentAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"),
        (abs(graft.functions.Exact.dec2(col("value"))) * 100).cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, CentAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          var total = prev
          rows.foreach { case (_, c) => total += c }
          state.update(total)
          ((prev / stepCents + 1) to (total / stepCents)).iterator
            .map(k => CentAlert(uid, k))
      }
  }

  /** A drained streaming run: the sink contents snapshotted into a
    * self-contained local DataFrame, plus the state-store row counts the
    * bounded-state specs pin (max across progress events, and the final
    * batch's total). */
  final case class DrainResult(df: DataFrame, maxStateRows: Long,
      finalStateRows: Long)

  /** Telemetry journal of completed drains — (sink name, micro-batch
    * count, max state rows, final state rows) — since the last poll.
    * The bench polls after each measured query and publishes the counts
    * in its per-query diag, so micro-batch engine overhead vs state
    * growth is attributable from the artifact alone. */
  private val drainLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long, Long)]

  /** For streaming drains driven outside this module (q126's ANN-ingest
    * loop in SimilarityOps): surface their batch/state telemetry through
    * the same per-query diag channel. */
  private[graft] def recordDrain(name: String, batches: Int,
      maxState: Long, finalState: Long): Unit =
    drainLog.add((name, batches, maxState, finalState))

  def pollDrainStats(): Seq[(String, Int, Long, Long)] = {
    val out = Seq.newBuilder[(String, Int, Long, Long)]
    var e = drainLog.poll()
    while (e != null) { out += e; e = drainLog.poll() }
    out.result()
  }

  /** Drive any of the above to a named in-memory sink until the source
    * is drained — the synchronous local smoke path.
    *
    * The returned DataFrame is a SNAPSHOT (LocalRelation over the sink's
    * rows — which already live in the driver; a memory sink buffers its
    * whole result there), not a lazy plan over the sink's temp view: the
    * view is dropped before returning, so no per-run result set outlives
    * its consumer in a multi-query session (Verify sweep, two-attempt
    * bench), and the result stays valid however late a caller evaluates
    * it. */
  /** State partition count for the drained stateful streams. A stateful
    * operator opens, commits, and snapshots one state-store instance PER
    * shuffle partition PER micro-batch — fixed overhead that dwarfs the
    * per-row work at bench-scale state (~10⁴–10⁵ rows: measured on the
    * stream-stream interval join, 14.3 s at 32 partitions, 5.1 s at 8,
    * 4.8 s at 4 — identical results). Streaming state partitioning is
    * also PINNED at first start (checkpointed), so it is a deliberate
    * sizing decision, not something to inherit from the batch shuffle
    * width: size it to state volume (here ~10k rows/partition). At
    * 100 TB state you raise this constant — the knob is the point; the
    * batch side of the same session keeps its own width. */
  private val StreamStatePartitions = 4

  /** Feed-scaled state width for the stateful drains whose state (or
    * single-micro-batch pass) is FEED-sized: one state-store instance
    * per shuffle partition costs fixed open/commit/snapshot overhead,
    * so small state wants few partitions (floor 4 — the measured
    * bench-scale optimum), while a feed-sized pass serializes through
    * too-few threads (q73's 4×2.5M rows = 57.6 s at sf10). Width =
    * feedRows / rowsPerPartition, floored at 4, capped at the
    * session's cores — and on a real cluster `defaultParallelism` IS
    * the scale-out: 100× the feed with 100× the executors keeps
    * rows-per-partition (hence per-task state-store size) constant.
    * `rowsPerPartition` is the per-query measured crossover (~1M for
    * q67's session rows, ~500k for q73's automaton pass). */
  private[graft] def feedScaledStateWidth(feedRows: Long,
      rowsPerPartition: Long, cores: Int): Int =
    math.max(4L, math.min(cores.toLong, feedRows / rowsPerPartition)).toInt

  def runToMemory(df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append,
      statePartitions: Int = StreamStatePartitions): DrainResult = {
    val spark = df.sparkSession
    val batchWidth = spark.conf.get("spark.sql.shuffle.partitions")
    val q =
      try {
        spark.conf.set("spark.sql.shuffle.partitions",
          math.min(statePartitions, batchWidth.toInt))
        df.writeStream.outputMode(mode)
          .format("memory").queryName(name).start()
      } finally
        // the stream captured its width at start; the session's batch
        // queries (and any foreachBatch body) keep theirs
        spark.conf.set("spark.sql.shuffle.partitions", batchWidth)
    try q.processAllAvailable()
    finally q.stop()
    val stateRows = q.recentProgress.toSeq
      .map(p => Option(p.stateOperators).map(_.map(_.numRowsTotal).sum)
        .getOrElse(0L))
    val sink = spark.table(name)
    val snapshot = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(sink.collect(): _*)),
      sink.schema)
    spark.catalog.dropTempView(name)
    val maxState = if (stateRows.isEmpty) 0L else stateRows.max
    val finalState = stateRows.lastOption.getOrElse(0L)
    drainLog.add((name, q.recentProgress.length, maxState, finalState))
    DrainResult(snapshot, maxState, finalState)
  }

  /** Append-mode drain into a parquet directory via `foreachBatch` —
    * for streams whose OUTPUT is feed-sized (q67's sessions: ~n rows),
    * where [[runToMemory]]'s driver-resident sink would haul the whole
    * result through the driver twice (collect + re-upload). Each
    * micro-batch's finalized rows write DISTRIBUTED into the directory
    * (the q78 admissions-log pattern) and the result is a lazy scan of
    * it — the 100 TB posture, where a streaming job's output lands in
    * object storage, not driver memory. The directory is a session-
    * lifetime artifact under the JVM tmpdir (one per drain run, MBs at
    * bench scale). */
  def runToParquet(df: DataFrame, name: String,
      statePartitions: Int = StreamStatePartitions): DataFrame = {
    val spark = df.sparkSession
    val outDir = java.nio.file.Files
      .createTempDirectory(s"graft_drain_$name").toString
    val batchWidth = spark.conf.get("spark.sql.shuffle.partitions")
    val q =
      try {
        spark.conf.set("spark.sql.shuffle.partitions",
          math.min(statePartitions, batchWidth.toInt))
        df.writeStream.outputMode(OutputMode.Append)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("append").parquet(outDir)
          }
          .start()
      } finally
        spark.conf.set("spark.sql.shuffle.partitions", batchWidth)
    try q.processAllAvailable()
    finally q.stop()
    val stateRows = q.recentProgress.toSeq
      .map(p => Option(p.stateOperators).map(_.map(_.numRowsTotal).sum)
        .getOrElse(0L))
    drainLog.add((name, q.recentProgress.length,
      if (stateRows.isEmpty) 0L else stateRows.max,
      stateRows.lastOption.getOrElse(0L)))
    spark.read.schema(df.schema).parquet(outDir)
  }

  /** Write the sf events file into `target` in the CANONICAL staged
    * encoding (µs TIMESTAMP_NTZ = [[rawSchema]]). Fast path: a source
    * already canonical is hard-copied byte-for-byte; a legacy
    * INT64-nanos source is rewritten once through [[normalizedEvents]].
    */
  private def stageCanonical(spark: SparkSession, d: String,
      target: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(d, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcIsLong = spark.read.parquet(src.toString)
      .schema("ts").dataType == org.apache.spark.sql.types.LongType
    if (srcIsLong) {
      val tmp = Files.createTempDirectory("graft_evcanon").toString
      normalizedEvents(spark, d)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      Files.move(singlePartFile(tmp), target, StandardCopyOption.REPLACE_EXISTING)
    } else {
      Files.copy(src, target, StandardCopyOption.REPLACE_EXISTING)
    }
    (): Unit
  }

  /** File-stream sources list a DIRECTORY; stage the sf events file into
    * a deterministic per-sf temp dir (idempotent copy). */
  private def stageEvents(spark: SparkSession, d: String): String = {
    import java.nio.file.{Files, Paths}
    val name = Paths.get(d).getFileName.toString
    val dir = Paths.get(
      sys.props("java.io.tmpdir"), "graft_events_stage_us", name)
    Files.createDirectories(dir)
    stageCanonical(spark, d, dir.resolve("events.parquet"))
    dir.toString
  }

  /** Marker value for the watermark-flush sentinel events staged by
    * [[stageEventsWithSentinels]] — sinks filter on it. */
  val SentinelType = "__graft_sentinel__"
  /** 2100-01-01T00:00 epoch seconds — far past any data event, so
    * `sentinel - watermark delay` closes every data window. */
  private val SentinelSec = 4102444800L

  /** Stage the sf events file PLUS two far-future sentinel events, each
    * in its own file, mod-times pinned so the file source (oldest-first,
    * `maxFilesPerTrigger=1`) processes data → sentinel₁ → sentinel₂ as
    * three ordered micro-batches. Why two: the watermark a batch runs
    * under is derived from the max event time of PRIOR batches, so the
    * batch that reads sentinel₁ still runs under the data-derived
    * watermark — it is sentinel₂'s batch, running under the
    * sentinel₁-derived watermark (already past every data event), that
    * deterministically emits all remaining closed windows BEFORE
    * `processAllAvailable` returns. Relying instead on Spark's no-data
    * flush micro-batch would race the drain's return. This is the
    * standard end-of-feed flush shape for a bounded replay of an
    * unbounded pipeline; on a true unbounded feed no sentinel is needed
    * — the next hour's data advances the watermark the same way. */
  private[graft] def stageEventsWithSentinels(
      spark: SparkSession, d: String): String = {
    import java.nio.file.{Files, Paths}
    val name = Paths.get(d).getFileName.toString
    val dir = Paths.get(
      sys.props("java.io.tmpdir"), "graft_events_stage_wm_us", name)
    Files.createDirectories(dir)
    val data = dir.resolve("a_events.parquet")
    stageCanonical(spark, d, data)
    Seq(1, 2).foreach { i =>
      val f = dir.resolve(s"b_sentinel$i.parquet")
      if (!Files.exists(f)) {
        val row = org.apache.spark.sql.Row(
          -i.toLong,
          java.time.LocalDateTime.ofEpochSecond(
            SentinelSec + i * 86400L, 0, java.time.ZoneOffset.UTC),
          -1L, SentinelType, 0.0, null)
        val tmp = Files.createTempDirectory("graft_sentinel").toString
        spark.createDataFrame(
          java.util.Collections.singletonList(row), rawSchema)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        Files.move(singlePartFile(tmp), f,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    // strictly increasing, re-run-stable mod-times: the file source
    // orders oldest-first on these, nothing else reads them
    data.toFile.setLastModified(1000000L)
    dir.resolve("b_sentinel1.parquet").toFile.setLastModified(2000000L)
    dir.resolve("b_sentinel2.parquet").toFile.setLastModified(3000000L)
    dir.toString
  }

  private val runSeq = new java.util.concurrent.atomic.AtomicInteger

  /** The STREAMING execution path, oracle-verified: runs the tumbling
    * aggregation as a real Structured Streaming query (file source →
    * watermarked stateful agg → memory sink, drained synchronously) and
    * returns the drained sink — hash-compared by the driver against the
    * SAME DuckDB oracle as the batch twin q17. APPEND output mode with a
    * staged sentinel flush ([[stageEventsWithSentinels]]): each window is
    * emitted exactly once when the watermark passes its end and its state
    * row is EVICTED — state stays bounded by the lateness horizon (~70
    * min of windows per type) on an unbounded feed, where Complete mode
    * would retain and re-emit every window forever. The decimal-routed
    * sum keeps the pre-watermark merge exact, so the streaming run is
    * held to the identical bit-for-bit standard as batch — Structured
    * Streaming's unified-model contract made checkable.
    * `StreamingSpec` pins the bounded-state claim: final state-store
    * rows after the drain ≤ the sentinel windows, never the window
    * count.
    */
  val q66StreamTumbling: QueryDef = QueryDef.sql(
    "q66_stream_tumbling",
    """SELECT make_timestamp(CAST(3600000000 * (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) AS BIGINT)) AS bucket,
      |       event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""") { (s, d) =>
    val out = s"stream_tumbling_${runSeq.incrementAndGet()}"
    val drained = runToMemory(
      windowedCounts(eventStream(s, stageEventsWithSentinels(s, d),
        oneFilePerBatch = true)),
      out, OutputMode.Append)
    // the streaming clock column is TIMESTAMP (watermarks want it); the
    // batch loader and oracle speak TIMESTAMP_NTZ — same UTC wall clock
    // (session tz pinned), so the cast only aligns the logical type
    drained.df
      .filter(col("event_type") =!= SentinelType)
      .select(col("bucket").cast("timestamp_ntz").as("bucket"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("bucket"), col("event_type"))
  }

  /** Session windows as a REAL streaming run, oracle-verified like q66
    * — the hardest streaming state shape (sessions merge as events
    * arrive). APPEND mode + sentinel flush: a session is emitted exactly
    * once when the watermark passes its close and its state is evicted,
    * so per-(user, session) state is bounded by the lateness horizon —
    * the only posture that survives unbounded session cardinality
    * (Complete mode would hold and re-emit every session ever seen).
    * Oracle = q19's relational session reconstruction, verbatim.
    */
  val q67StreamSession: QueryDef = QueryDef.sql(
    "q67_stream_session",
    """WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu, value FROM events),
      |y AS (SELECT user_id, tsu, value,
      |  CASE WHEN lag(tsu) OVER w IS NULL
      |         OR tsu - lag(tsu) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY tsu)),
      |z AS (SELECT user_id, tsu, value,
      |  sum(brk) OVER (PARTITION BY user_id ORDER BY tsu ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM y)
      |SELECT user_id, min(tsu) AS session_start, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM z
      |GROUP BY user_id, sess
      |ORDER BY user_id, session_start""") { (s, d) =>
    val out = s"stream_session_${runSeq.incrementAndGet()}"
    // session OUTPUT is feed-sized, so the drain writes distributed
    // parquet instead of a driver memory sink (11.7 s -> 6.5 s at sf1).
    // The state WIDTH scales with the feed like q73's (sf1's 955k state
    // rows measured best at 4 partitions — per-task state-store
    // overhead beats parallelism there — but sf10's 9.5M rows in one
    // big micro-batch serialize through those 4 threads; ~1M state rows
    // per partition is the re-measured crossover, floor 4, cap cores).
    val feedRows = graft.sources.Tables.events(s, d).count()
    val width = feedScaledStateWidth(feedRows, 1000000L,
      s.sparkContext.defaultParallelism)
    val drained = runToParquet(
      sessionCounts(eventStream(s, stageEventsWithSentinels(s, d),
        oneFilePerBatch = true)),
      out, statePartitions = width)
    drained
      .filter(col("user_id") >= 0) // sentinel sessions carry user_id -1
      .select(col("user_id"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("n"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Stage the sf events file TWICE (two file names in one source
    * directory) — a deliberately duplicated feed for the dedup query. */
  private def stageEventsDup(spark: SparkSession, d: String): String = {
    import java.nio.file.{Files, Paths}
    val name = Paths.get(d).getFileName.toString
    val dir = Paths.get(
      sys.props("java.io.tmpdir"), "graft_events_stage_dup_us", name)
    Files.createDirectories(dir)
    Seq("a.parquet", "b.parquet").foreach { f =>
      stageCanonical(spark, d, dir.resolve(f))
    }
    dir.toString
  }

  /** Streaming exactly-once dedup, oracle-verified: the source feed
    * carries every event TWICE (two staged copies of the file — the
    * at-least-once-delivery shape), the engine-side
    * `dropDuplicatesWithinWatermark(event_id)` collapses it, and the
    * drained sink aggregates back to the per-type totals of the
    * SINGLE-copy batch table — which is exactly the DuckDB oracle.
    * The WATERMARKED dedup ([[dedupedStream]]) is the registered path:
    * state is bounded to keys within the 1-hour lateness horizon
    * instead of one entry per event_id forever, which is the only form
    * that survives an unbounded feed. Both staged copies land in one
    * micro-batch (no `maxFilesPerTrigger`), and would collapse
    * identically across batches as long as the duplicate arrives within
    * the horizon — the at-least-once redelivery contract this operator
    * models.
    *
    * The per-type totals are computed DISTRIBUTED, per micro-batch,
    * inside `foreachBatch` — the deduped feed is feed-sized (1M rows at
    * sf1), so draining it through a driver-resident memory sink and
    * re-aggregating in batch hauls the whole corpus through the driver
    * (measured 11.8 s at sf1, 2.2 s of it GC — the r9 suite's
    * third-worst absolute cost). Dedup emits every event exactly once,
    * so each batch's per-type (count, Σ decimal) partials combine
    * additively; the driver accumulates only |event_types| × batches
    * partial rows, and the decimal sums merge exactly in any order
    * before the single final double cast. This is the 100 TB shape: the
    * deduped stream feeds a distributed aggregation, never a driver
    * collect. (Chaining the aggregation INTO the streaming query as a
    * second stateful operator is the one shape Append mode cannot
    * finalize for a windowless global agg.)
    */
  val q70StreamDedup: QueryDef = QueryDef.sql(
    "q70_stream_dedup",
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY 1""") { (s, d) =>
    val out = s"stream_dedup_${runSeq.incrementAndGet()}"
    val deduped = dedupedStream(eventStream(s, stageEventsDup(s, d)))
    val partials =
      new java.util.concurrent.ConcurrentLinkedQueue[
        (String, Long, java.math.BigDecimal)]
    val batchWidth = s.conf.get("spark.sql.shuffle.partitions")
    val q =
      try {
        s.conf.set("spark.sql.shuffle.partitions",
          math.min(StreamStatePartitions, batchWidth.toInt))
        deduped.writeStream.outputMode(OutputMode.Append)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.groupBy(col("event_type"))
              .agg(count(lit(1)).as("n"),
                sum(col("value").cast("decimal(18,2)")).as("sv"))
              .collect().foreach { r =>
                partials.add((r.getString(0), r.getLong(1),
                  r.getDecimal(2)))
              }
          }
          .start()
      } finally s.conf.set("spark.sql.shuffle.partitions", batchWidth)
    try q.processAllAvailable()
    finally q.stop()
    val stateRows = q.recentProgress.toSeq
      .map(p => Option(p.stateOperators).map(_.map(_.numRowsTotal).sum)
        .getOrElse(0L))
    drainLog.add((out, q.recentProgress.length,
      if (stateRows.isEmpty) 0L else stateRows.max,
      stateRows.lastOption.getOrElse(0L)))
    import scala.jdk.CollectionConverters._
    val merged = partials.asScala.toSeq
      .groupBy(_._1).toSeq
      .map { case (t, rs) =>
        (t, rs.map(_._2).sum,
          rs.map(_._3).reduce(_ add _)) }
    import s.implicits._
    merged.toDF("event_type", "n", "sv")
      .select(col("event_type"), col("n"),
        col("sv").cast("decimal(18,2)").cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Custom keyed state (`flatMapGroupsWithState`) as a real streaming
    * run, oracle-verified: per-user threshold alerts — one row per
    * 50-unit multiple the user's running Σ|value| crosses — drained and
    * summarized per user. The exact-cents state (see
    * [[thresholdAlertsCents]]) makes the emitted alert set a closed-form
    * function of the final totals, independent of micro-batch
    * boundaries, so the 0..N-outputs-per-group state rung gets the same
    * bit-exact driver verification as the windowed aggregations.
    * Scale posture: state is 8 bytes per user, the shuffle is the one
    * group-key exchange, and alerts stream out append-mode (no
    * Complete-mode re-emission).
    */
  val q73StreamAlerts: QueryDef = QueryDef.sql(
    "q73_stream_alerts",
    """WITH t AS (SELECT user_id,
      |    CAST(sum(CAST(abs(value) AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM events GROUP BY 1)
      |SELECT user_id, CAST(cents // 5000 AS BIGINT) AS n_alerts,
      |  CAST((cents // 5000) * 50 AS DOUBLE) AS max_crossed
      |FROM t WHERE cents >= 5000 ORDER BY user_id""") { (s, d) =>
    val out = s"stream_alerts_${runSeq.incrementAndGet()}"
    val alerts = thresholdAlertsCents(
      eventStream(s, stageEvents(s, d)), stepCents = 5000L)
    // state width sized to the FEED, not the constant: the whole feed
    // arrives as one micro-batch here (single staged file), so the
    // flatMapGroupsWithState pass is feed ÷ statePartitions rows per
    // thread — at the 10M-event sf10 feed, 4 partitions serialized
    // 2.5M rows each (measured 57.6 s); ~500k rows/partition is the
    // re-measured sweet spot, floor 4, cap at the session's cores.
    // Emission per user is a closed-form function of its final total
    // (see thresholdAlertsCents), so partitioning never changes results.
    val feedRows = graft.sources.Tables.events(s, d).count()
    val width = feedScaledStateWidth(feedRows, 500000L,
      s.sparkContext.defaultParallelism)
    // alert OUTPUT is feed-sized (~1 alert/event at the bench feeds:
    // 9.9M rows at sf10), so drain distributed like q67 — the memory
    // sink hauled the whole alert set through the driver twice
    // (measured 51 s at sf10; the state pass itself is seconds).
    runToParquet(alerts.toDF(), out, statePartitions = width)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_alerts"),
        (max(col("k")) * 50.0).as("max_crossed"))
      .orderBy(col("user_id"))
  }

  /** STREAM-STATIC enrichment join, oracle-verified: the unbounded event
    * stream joins a static dimension (customer market segment) inside
    * the streaming query — the canonical enrichment shape for a
    * training-data ingest pipeline (attach per-user/tenant/license
    * metadata as events arrive). The dimension is broadcast: each
    * micro-batch probes a driver-built hash relation, the stream side
    * never shuffles for the join, and the only stateful operator is the
    * downstream windowless aggregation (Complete mode ⇒ drained result
    * is micro-batch-boundary independent; decimal sum ⇒ bit-exact vs
    * the batch oracle). At 100 TB the same plan holds: dims that
    * outgrow a broadcast fall back to a shuffled stream-static join,
    * but segment-sized dims are exactly what broadcast is for.
    *
    * This drain stays in Complete mode DELIBERATELY: the aggregation is
    * windowless, so its state is exactly one row per market segment —
    * #segments (5) rows, a constant bound independent of feed length.
    * Complete-mode hazard only exists when state cardinality grows with
    * the feed (windows, sessions); a fixed-cardinality global rollup is
    * the one case where it is the honest mode.
    */
  val q75StreamEnrich: QueryDef = QueryDef.sql(
    "q75_stream_enrich",
    """SELECT c_mktsegment AS segment, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1 ORDER BY 1""") { (s, d) =>
    val out = s"stream_enrich_${runSeq.incrementAndGet()}"
    val dim = graft.sources.Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"))
    val enriched = eventStream(s, stageEvents(s, d))
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Exact.sumd2(col("value")).as("sum_value"))
    runToMemory(enriched, out, OutputMode.Complete).df
      .orderBy(col("segment"))
  }

  /** STREAMING point-in-time enrichment — q97's feature-store join at
    * INGEST time: each arriving fact picks up the dimension version
    * valid at its event time from the (broadcast) SCD2 interval table,
    * the shape a feature pipeline uses to label events as they land
    * rather than in a backfill. The stream-static interval join is
    * STATELESS (each micro-batch probes the broadcast dim; no join
    * state at all — the intervals are closed history), and the rollup
    * is windowless with ≤ #states × #types rows of state, so Complete
    * mode is the honest drain exactly as in q75. The batch union-carry
    * (q97) and this broadcast interval probe are the two ends of the
    * same operator: carry-forward when the dim is fact-sized, broadcast
    * probe when versions fit memory. Oracle: q97's ASOF aggregation
    * without the distinct-user column (DISTINCT aggregates are
    * unsupported in streaming).
    */
  val q99StreamPit: QueryDef = QueryDef.sql(
    "q99_stream_pit",
    """WITH e AS (SELECT user_id, event_id, event_type,
      |            CAST(ts AS TIMESTAMP) AS tsu FROM events),
      |ch0 AS (SELECT user_id, event_id, event_type AS state, tsu,
      |          lag(event_type) OVER (PARTITION BY user_id
      |            ORDER BY tsu, event_id) AS prev
      |        FROM e),
      |ch AS (SELECT user_id, state, tsu FROM ch0
      |       WHERE prev IS NULL OR prev <> state
      |       QUALIFY row_number() OVER (PARTITION BY user_id, tsu
      |         ORDER BY event_id DESC) = 1),
      |pit AS (SELECT e.user_id, e.event_type, ch.state
      |        FROM e ASOF JOIN ch
      |          ON e.user_id = ch.user_id AND e.tsu >= ch.tsu)
      |SELECT state, event_type, count(*) AS n
      |FROM pit GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // SCD2 intervals from the closed history (q91's build), broadcast
    val w = Window.partitionBy(col("duser")).orderBy(col("vfrom"))
    val dim = graft.sources.Tables.events(s, d)
      .select(col("user_id").as("duser"), col("event_id"),
        col("event_type").as("state"),
        col("ts").cast("timestamp").as("vfrom"))
      .withColumn("prev", lag(col("state"), 1)
        .over(Window.partitionBy(col("duser"))
          .orderBy(col("vfrom"), col("event_id"))))
      .filter(col("prev").isNull || col("prev") =!= col("state"))
      // one version per (user, instant) — the max-event_id change wins,
      // mirroring the oracle's QUALIFY and q97's batch dedup; vfrom is
      // then unique per user, so the lead() interval build has no ties
      .withColumn("rn", row_number()
        .over(Window.partitionBy(col("duser"), col("vfrom"))
          .orderBy(col("event_id").desc)))
      .filter(col("rn") === 1)
      .withColumn("vto", lead(col("vfrom"), 1).over(w))
      .select(col("duser"), col("state"), col("vfrom"), col("vto"))
    val out = s"stream_pit_${runSeq.incrementAndGet()}"
    val enriched = eventStream(s, stageEvents(s, d))
      .join(broadcast(dim),
        col("user_id") === col("duser") && col("ts") >= col("vfrom") &&
          (col("vto").isNull || col("ts") < col("vto")))
      .groupBy(col("state"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    runToMemory(enriched, out, OutputMode.Complete).df
      .orderBy(col("state"), col("event_type"))
  }

  private val docSchema: StructType = StructType.fromDDL(
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")

  /** Stage the delta corpus (source = 'src0') as THREE parquet files
    * split on contiguous doc_id ranges, mod-times pinned ascending so
    * the file source (`maxFilesPerTrigger=1`, oldest-first) delivers
    * them as three ordered micro-batches — "earlier in the delta"
    * coincides with "smaller doc_id", which is what lets the drained
    * admission set match the batch oracle exactly. */
  private def stageDeltaDocs(spark: SparkSession, d: String): String = {
    import java.nio.file.{Files, Paths}
    val name = Paths.get(d).getFileName.toString
    val dir = Paths.get(
      sys.props("java.io.tmpdir"), "graft_delta_stage", name)
    val done = dir.resolve("_staged")
    val fp = srcFingerprint(Paths.get(d, "documents.parquet"))
    if (!stagedFresh(done, fp)) {
      Files.createDirectories(dir)
      val delta = graft.sources.Tables.documents(spark, d)
        .filter(col("source") === "src0")
      // tercile cuts at O(1) driver cost (exact quantiles, relativeError
      // 0) — the admission semantics are cut-position-independent
      // because ranges are doc_id-ordered and the within-batch relation
      // orders on doc_id too, so ANY ordered 3-way split yields the same
      // admission set; collecting the full delta ID list here was the
      // one registered path whose driver memory grew with an input table
      val cuts = delta.stat
        .approxQuantile("doc_id", Array(1.0 / 3, 2.0 / 3), 0.0)
        .map(_.toLong).toSeq
      require(cuts.length == 2, "q78: no src0 delta documents")
      val ranges = Seq(
        (Long.MinValue, cuts.head), (cuts.head + 1, cuts(1)),
        (cuts(1) + 1, Long.MaxValue))
      ranges.zipWithIndex.foreach { case ((lo, hi), i) =>
        val tmp = Files.createTempDirectory("graft_delta_part").toString
        delta.filter(col("doc_id").between(lo, hi))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        Files.move(singlePartFile(tmp), dir.resolve(s"delta_$i.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      writeMarker(done, fp)
    }
    (0 to 2).foreach { i =>
      dir.resolve(s"delta_$i.parquet").toFile
        .setLastModified(1000000L * (i + 1)): Unit
    }
    dir.toString
  }

  /** STREAMING incremental delta-vs-corpus dedup — q76's ingest-time
    * twin, drained against the IDENTICAL batch oracle: the new source's
    * documents arrive as an ordered file stream (three micro-batches);
    * each batch probes the persisted corpus signature artifact PLUS the
    * signatures of every earlier-seen delta document on the 4 LSH band
    * keys, candidates are exact-Jaccard-verified through the shared
    * index, and per-batch admission decisions append to the sink. After
    * each batch the batch's signatures (admitted AND dropped — "seen
    * earlier" is what dedup is against, exactly as the corpus-wide pair
    * set treats earlier delta docs) join the probe side. This unifies
    * q70's within-stream dedup with q76's corpus admission — the shape a
    * 100 TB ingest actually runs: per-batch cost is batch-sized joins
    * against a persisted, incrementally-growing signature artifact,
    * never corpus².
    *
    * The probe-side signature table is re-pinned (`localCheckpoint`)
    * after each batch union, so lineage stays one batch deep and the
    * growing artifact is exactly the materialized table a production
    * pipeline persists per snapshot. Signature VALUES for batch docs
    * come from the session-cached corpus signature table filtered to the
    * batch (content-identical to computing them on ingest with the
    * snapshot's stop-shingle list — and verified so by the shared
    * oracle).
    */
  val q78StreamIncrDedup: QueryDef = QueryDef.sql(
    "q78_stream_incr_dedup",
    graft.operators.TextOps.incrementalDedupOracle) { (s, d) =>
    import graft.operators.TextOps
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_admissions").toString
    val sig = TextOps.bandSignatures(s, d)
    val deltaIds = graft.sources.Tables.documents(s, d)
      .filter(col("source") === "src0").select(col("doc_id"))
    // the persisted per-snapshot artifact: signatures of everything
    // already ingested (all non-delta docs)
    var seen = sig.join(broadcast(deltaIds), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val stream = s.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDeltaDocs(s, d))
    val q = stream.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ids = batch.select(col("doc_id"))
        val sigB = sig.join(broadcast(ids), Seq("doc_id"), "left_semi")
          .localCheckpoint()
        // batch probes everything seen so far: (seen, batch) candidates…
        val candCross = sigB.as("x")
          .join(seen.as("y"),
            col("x.band") === col("y.band") && col("x.s") === col("y.s"))
          .select(col("y.doc_id").as("d1"), col("x.doc_id").as("d2"))
        // …plus within-batch keep-first (earlier doc_id wins)
        val candIntra = sigB.as("x")
          .join(sigB.as("y"),
            col("x.band") === col("y.band") && col("x.s") === col("y.s") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        val drops = TextOps.verifiedJaccard(
            s, d, candCross.union(candIntra).distinct(), threshold = 0.5)
          .select(col("d2").as("doc_id")).distinct()
          .withColumn("dropped", lit(1))
        batch.select(col("doc_id"), col("source"))
          .join(broadcast(drops), Seq("doc_id"), "left")
          .write.mode("append").parquet(outDir)
        seen = seen.union(sigB).localCheckpoint()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val res = s.read.parquet(outDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_new"),
        sum(when(col("dropped").isNotNull, 1).otherwise(0))
          .cast("long").as("n_dropped"),
        sum(when(col("dropped").isNull, 1).otherwise(0))
          .cast("long").as("n_ingested"))
      .orderBy(col("source"))
    // snapshot the (source-count-sized) summary and remove the per-run
    // staging dir — nothing lazy may point at /tmp after the drain
    val snap = s.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(res.collect(): _*)),
      res.schema)
    def del(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
    }
    del(new java.io.File(outDir))
    snap
  }

  /** Streaming queries registered with the driver contract. */
  /** Stream-stream INTERVAL join as a real streaming run — the §2.H
    * join shape a batch rewrite cannot emulate incrementally:
    * click→purchase attribution within a 1-hour window, BOTH sides
    * watermarked, so the join buffers each side's rows only until the
    * other side's watermark clears the interval bound — join state is
    * evicted by event time and stays bounded by watermark + interval on
    * an unbounded feed. The inner interval join emits in APPEND mode as
    * soon as both rows have arrived; the staged sentinel files advance
    * the watermark through the drain so buffered state is released
    * (sentinels never enter the join — their type matches neither
    * side's filter — but they flow through the watermark operators,
    * which sit upstream of the type filters for exactly this reason).
    * Oracle: the identical batch interval join — same inclusive bounds,
    * same µs lag arithmetic — so the streaming run is held to the same
    * bit-for-bit standard as every batch query.
    */
  val q81StreamIntervalJoin: QueryDef = QueryDef.sql(
    "q81_stream_interval_join",
    """WITH e AS (SELECT user_id, event_id, event_type,
      |            CAST(ts AS TIMESTAMP) AS tsu FROM events),
      |c AS (SELECT user_id, event_id AS click_id, tsu AS cts FROM e
      |      WHERE event_type = 'click'),
      |p AS (SELECT user_id, event_id AS purchase_id, tsu AS pts FROM e
      |      WHERE event_type = 'purchase')
      |SELECT c.user_id, click_id, purchase_id,
      |       CAST(epoch_us(pts) - epoch_us(cts) AS BIGINT) AS lag_us
      |FROM c JOIN p ON p.user_id = c.user_id
      |  AND pts >= cts AND pts <= cts + INTERVAL 1 HOUR
      |ORDER BY 1, 2, 3""") { (s, d) =>
    val staged = stageEventsWithSentinels(s, d)
    val clicks = joinSide(s, staged, "click", "c_uid", "click_id", "cts")
    val purchases =
      joinSide(s, staged, "purchase", "p_uid", "purchase_id", "pts")
    val joined = clicks.join(purchases,
      expr("c_uid = p_uid AND pts >= cts AND pts <= cts + interval 1 hour"))
    val out = s"stream_ijoin_${runSeq.incrementAndGet()}"
    val drained = runToMemory(
      joined.select(col("c_uid").as("user_id"), col("click_id"),
        col("purchase_id"),
        (unix_micros(col("pts").cast("timestamp")) - unix_micros(col("cts").cast("timestamp"))).as("lag_us")),
      out, OutputMode.Append)
    drained.df.filter(col("user_id") >= 0)
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
  }

  /** One side of a stream-stream join: watermark the RAW feed, then
    * narrow to the wanted type while LETTING SENTINEL ROWS THROUGH.
    * The subtlety this encodes: Catalyst pushes non-event-time
    * predicates BELOW the EventTimeWatermark operator, so a type filter
    * that excludes the sentinels drops them before they can advance the
    * watermark — the join then never learns the feed ended, the
    * tail-of-feed buffers are never evicted, and an outer join never
    * emits its last null rows (measured: every unmatched click younger
    * than min(side maxima) − lateness − interval silently vanished from
    * the drain until the sentinels were let through). Sentinel rows
    * carry user_id −1, so join output they participate in is dropped at
    * the SINK side instead, where the watermark no longer cares. */
  private def joinSide(s: SparkSession, staged: String, tpe: String,
      uid: String, id: String, t: String): DataFrame =
    eventStream(s, staged, oneFilePerBatch = true)
      .withWatermark("ts", "1 hour")
      .filter(col("event_type") === tpe ||
        col("event_type") === SentinelType)
      .select(col("user_id").as(uid), col("event_id").as(id),
        col("ts").as(t))

  /** LEFT OUTER stream-stream interval join — the subtlest streaming
    * emission semantic in the engine: a matched pair emits as soon as
    * both rows arrive (like q81's inner join), but an UNMATCHED click
    * can only emit its null-extended row once the watermark proves no
    * matching purchase can still arrive — i.e. when event time passes
    * the end of its interval plus the lateness horizon. Getting these
    * rows out at all REQUIRES the watermark to advance past the data
    * (the sentinel flush reaching the watermark operator — see
    * [[joinSide]] for the pushdown trap this query exposed), which is
    * why this query exists: it pins the null-emission path, not just
    * the match path. Same bounded join state as q81 (both sides'
    * buffers evicted by event time). Oracle: the batch LEFT JOIN with
    * identical inclusive bounds — null purchase columns and all.
    */
  val q83StreamOuterJoin: QueryDef = QueryDef.sql(
    "q83_stream_outer_join",
    """WITH e AS (SELECT user_id, event_id, event_type,
      |            CAST(ts AS TIMESTAMP) AS tsu FROM events),
      |c AS (SELECT user_id, event_id AS click_id, tsu AS cts FROM e
      |      WHERE event_type = 'click'),
      |p AS (SELECT user_id, event_id AS purchase_id, tsu AS pts FROM e
      |      WHERE event_type = 'purchase')
      |SELECT c.user_id, click_id, purchase_id,
      |       CAST(epoch_us(pts) - epoch_us(cts) AS BIGINT) AS lag_us
      |FROM c LEFT JOIN p ON p.user_id = c.user_id
      |  AND pts >= cts AND pts <= cts + INTERVAL 1 HOUR
      |ORDER BY 1, 2, 3""") { (s, d) =>
    val staged = stageEventsWithSentinels(s, d)
    val clicks = joinSide(s, staged, "click", "c_uid", "click_id", "cts")
    val purchases =
      joinSide(s, staged, "purchase", "p_uid", "purchase_id", "pts")
    val joined = clicks.join(purchases,
      expr("c_uid = p_uid AND pts >= cts AND pts <= cts + interval 1 hour"),
      "leftOuter")
    val out = s"stream_ojoin_${runSeq.incrementAndGet()}"
    // outer-join OUTPUT is click-sized (~2M rows at sf10 — every
    // unmatched click emits), so drain distributed like q67/q73 rather
    // than hauling it through the driver memory sink twice
    val drained = runToParquet(
      joined.select(col("c_uid").as("user_id"), col("click_id"),
        col("purchase_id"),
        (unix_micros(col("pts").cast("timestamp")) - unix_micros(col("cts").cast("timestamp"))).as("lag_us")),
      out)
    drained.filter(col("user_id") >= 0)
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
  }

  final case class FunnelHit(user_id: Long, purchase_us: Long)

  /** Stage the events file as THREE parquet files split on event-time
    * terciles, mod-times pinned ascending: the file source
    * (`maxFilesPerTrigger=1`, oldest-first) replays the feed as three
    * micro-batches in event-time order — every event in batch i
    * precedes every event in batch i+1, so per-user cross-batch order
    * is globally time-ordered, which is what lets keyed sequential
    * state (the funnel automaton) carry across batch boundaries
    * without an event-time reorder buffer. */
  private[graft] def stageEventsOrdered(
      spark: SparkSession, d: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val name = Paths.get(d).getFileName.toString
    val dir = Paths.get(
      sys.props("java.io.tmpdir"), "graft_events_stage_ord_us", name)
    val done = dir.resolve("_staged")
    val fp = srcFingerprint(Paths.get(d, "events.parquet"))
    if (!stagedFresh(done, fp)) {
      Files.createDirectories(dir)
      val raw = normalizedEvents(spark, d)
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      val mm = raw.agg(min(col("ts_us")), max(col("ts_us"))).head
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val step = math.max((hi - lo) / 3, 1L)
      (0 to 2).foreach { i =>
        val from = lo + i * step
        val until = if (i == 2) hi + 1 else lo + (i + 1) * step
        val tmp = Files.createTempDirectory("graft_evord").toString
        raw.filter(col("ts_us") >= from && col("ts_us") < until)
          .drop("ts_us")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val f = dir.resolve(s"part$i.parquet")
        Files.move(singlePartFile(tmp), f, StandardCopyOption.REPLACE_EXISTING)
        f.toFile.setLastModified(1000000L * (i + 1))
      }
      writeMarker(done, fp)
    }
    dir.toString
  }

  /** The q86 funnel automaton as KEYED STREAMING STATE: 17 bytes per
    * user — (lastView, bestStart, done) — carried across micro-batches;
    * within a batch the per-user slice is sorted by (ts, step-rank)
    * before folding, the bounded reorder buffer a micro-batch engine
    * gets for free because a batch's rows are already in hand. Emits
    * each user's first converting purchase exactly once (Append mode),
    * then the `done` flag makes every later batch a no-op for that user.
    */
  def funnelHits(events: DataFrame, windowUs: Long): Dataset[FunnelHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id").cast("long"),
        when(col("event_type") === "view", 0)
          .when(col("event_type") === "click", 1).otherwise(2),
        unix_micros(col("ts").cast("timestamp")))
      .as[(Long, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Boolean), FunnelHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[(Long, Long, Boolean)]) =>
          var (lastView, bestStart, done) =
            state.getOption.getOrElse((Long.MinValue, Long.MinValue, false))
          var hit: List[FunnelHit] = Nil
          rows.toArray.sortBy(r => (r._3, r._2)).foreach { case (_, rank, us) =>
            if (!done) rank match {
              case 0 => if (us > lastView) lastView = us
              case 1 => if (lastView > bestStart) bestStart = lastView
              case _ =>
                if (bestStart != Long.MinValue && us - bestStart <= windowUs) {
                  done = true
                  hit = List(FunnelHit(uid, us))
                }
            }
          }
          state.update((lastView, bestStart, done))
          hit.iterator
      }
  }

  /** STREAMING funnel, oracle-verified against batch q86's 3-way-join
    * oracle: the ingest-time shape of sequential-pattern detection — a
    * file source replays the feed as three event-time-ordered
    * micro-batches ([[stageEventsOrdered]]) and the [[funnelHits]]
    * automaton folds each user's stream under flatMapGroupsWithState,
    * state crossing batch boundaries (a view in batch 1 completes a
    * funnel whose purchase arrives in batch 3). Constant per-user state
    * and exactly-once emission; `StreamingSpec` pins the state bound and
    * batch-boundary carry. */
  val q88StreamFunnel: QueryDef = QueryDef.sql(
    "q88_stream_funnel",
    """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS tsu FROM events),
      |v AS (SELECT user_id, tsu FROM e WHERE event_type = 'view'),
      |c AS (SELECT user_id, tsu FROM e WHERE event_type = 'click'),
      |p AS (SELECT user_id, tsu FROM e WHERE event_type = 'purchase')
      |SELECT p.user_id, CAST(epoch_us(min(p.tsu)) AS BIGINT) AS purchase_us
      |FROM p JOIN c ON c.user_id = p.user_id AND c.tsu <= p.tsu
      |       JOIN v ON v.user_id = c.user_id AND v.tsu <= c.tsu
      |             AND p.tsu <= v.tsu + INTERVAL 48 HOUR
      |GROUP BY p.user_id ORDER BY p.user_id""") { (s, d) =>
    val out = s"stream_funnel_${runSeq.incrementAndGet()}"
    val hits = funnelHits(
      eventStream(s, stageEventsOrdered(s, d), oneFilePerBatch = true),
      windowUs = 48L * 3600L * 1000000L)
    runToMemory(hits.toDF(), out, OutputMode.Append).df
      .orderBy(col("user_id"))
  }

  /** Streaming cardinality monitoring — per-window approximate distinct
    * users as a REAL streaming run: the HLL++ buffer is a mergeable
    * aggregation state, so `approx_count_distinct` runs under a
    * watermarked streaming window exactly like a sum — per-(window,
    * type) sketch state, evicted on watermark advance (Append mode +
    * sentinel flush, the q66 harness). This is how a 100 TB feed tracks
    * unique actors per hour: an exact streaming distinct would hold
    * every user id per open window in the state store; the sketch holds
    * 512 registers. Verified by HASH via a DETERMINISTIC property: the
    * drained streaming estimate must EQUAL the batch estimate of the
    * identical aggregate — the HLL++ estimate is a pure
    * order-independent function of the input value set, so any loss in
    * the state-store buffer merge across micro-batches breaks equality
    * loudly. (A relative-error bound à la q39 is NOT hashable here:
    * per-hour windows can hold 4 users, where one register collision
    * breaks any 2×rsd check — the q39 bound is only meaningful at
    * aggregate cardinalities, which `ScaleOpsSpec` covers.) The hashed
    * row carries the batch-exact count, the row count, and the
    * equality boolean; the engine-specific estimate stays out. */
  val q96StreamDistinct: QueryDef = QueryDef.sql(
    "q96_stream_distinct",
    """SELECT make_timestamp(CAST(3600000000 * (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) AS BIGINT)) AS bucket,
      |       event_type, count(DISTINCT user_id) AS exact_users,
      |       count(*) AS n, TRUE AS stream_equals_batch
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
    val rsd = graft.operators.ScaleOps.Rsd
    val out = s"stream_distinct_${runSeq.incrementAndGet()}"
    val drained = runToMemory(
      eventStream(s, stageEventsWithSentinels(s, d), oneFilePerBatch = true)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users")),
      out, OutputMode.Append)
    val sketch = drained.df
      .filter(col("event_type") =!= SentinelType)
      .select(col("window.start").cast("timestamp_ntz").as("bucket"),
        col("event_type"), col("approx_users"))
    graft.sources.Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"),
        approx_count_distinct(col("user_id"), rsd).as("batch_approx"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("exact_users"), col("n"), col("batch_approx"))
      .join(sketch, Seq("bucket", "event_type"))
      .select(col("bucket"), col("event_type"), col("exact_users"),
        col("n"),
        (col("approx_users") === col("batch_approx"))
          .as("stream_equals_batch"))
      .orderBy(col("bucket"), col("event_type"))
  }

  final case class MgSnap(event_type: String, n_seen: Long, cands: Array[Long])

  /** Misra-Gries frequent-items sketch as KEYED STREAMING STATE: per
    * event_type, a capacity-`cap` candidate map folded over the value
    * stream (floor(value) buckets), carried across micro-batches — the
    * streaming form of q92's two-pass heavy-hitters. State is O(cap)
    * per key FOREVER, regardless of stream length or distinct-bucket
    * cardinality — the property that makes frequent-items monitoring
    * viable on an unbounded 100 TB feed where an exact per-bucket count
    * would grow state without bound. Each batch emits the key's current
    * (n_seen, sorted candidates) snapshot (Update mode); n_seen is
    * strictly monotone per key, so the final sketch is recoverable from
    * the drained sink without an end-of-stream signal.
    */
  def mgCandidates(events: DataFrame, cap: Int): Dataset[MgSnap] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_type"), floor(col("value")).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Map[Long, Long]), MgSnap](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (etype, rows, state: GroupState[(Long, Map[Long, Long])]) =>
          var (n, m) = state.getOption.getOrElse((0L, Map.empty[Long, Long]))
          rows.foreach { case (_, bk) =>
            n += 1
            m = m.get(bk) match {
              case Some(c) => m.updated(bk, c + 1)
              case None if m.size < cap => m.updated(bk, 1L)
              // decrement-all: cancels one occurrence of bk against one
              // of each resident candidate; zeros drop out (MG 1982)
              case None => m.collect { case (t, c) if c > 1 => t -> (c - 1) }
            }
          }
          state.update((n, m))
          Iterator.single(MgSnap(etype, n, m.keysIterator.toArray.sorted))
      }
  }

  /** STREAMING heavy hitters, oracle-verified EXACTLY: the MG candidate
    * sketch ([[mgCandidates]], capacity 249) folds the event-time-ordered
    * 3-batch replay, then the drained final candidates (largest-n_seen
    * snapshot per key) are exact-counted in batch and thresholded at
    * freq > total/125. MG guarantees every bucket with freq > n/250 is
    * a candidate whatever the arrival order, so the candidate set is a
    * strict superset of the answer and the exact pass only prunes —
    * the registered result equals the plain GROUP BY + HAVING oracle,
    * while the streaming side never held more than 249 entries per key.
    */
  val q104StreamHeavyHitters: QueryDef = QueryDef.sql(
    "q104_stream_heavy_hitters",
    """WITH e AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS bucket FROM events),
      |c AS (SELECT event_type, bucket, count(*) AS freq FROM e GROUP BY 1, 2),
      |t AS (SELECT event_type, count(*) AS total FROM e GROUP BY 1)
      |SELECT c.event_type, bucket, freq, total
      |FROM c JOIN t USING (event_type)
      |WHERE 125 * freq > total
      |ORDER BY event_type, freq DESC, bucket""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val out = s"stream_hh_${runSeq.incrementAndGet()}"
    val snaps = runToMemory(
      mgCandidates(eventStream(s, stageEventsOrdered(s, d),
        oneFilePerBatch = true), cap = 249).toDF(),
      out, OutputMode.Update).df
    val w = Window.partitionBy(col("event_type")).orderBy(col("n_seen").desc)
    val cands = snaps.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), explode(col("cands")).as("bucket"))
    val e = normalizedEvents(s, d)
      .select(col("event_type"), floor(col("value")).cast("long").as("bucket"))
    val totals = e.groupBy(col("event_type")).agg(count(lit(1)).as("total"))
    e.join(broadcast(cands), Seq("event_type", "bucket"), "left_semi")
      .groupBy(col("event_type"), col("bucket")).agg(count(lit(1)).as("freq"))
      .join(broadcast(totals), "event_type")
      .filter(lit(125) * col("freq") > col("total"))
      .select(col("event_type"), col("bucket"), col("freq"), col("total"))
      .orderBy(col("event_type"), col("freq").desc, col("bucket"))
  }

  /** STREAMING distribution-drift monitor — the data-quality watch a
    * 100 TB ingest keeps on its feeds: per hour window, the total-
    * variation distance (in ppm halves) between the window's value-
    * bucket distribution and the whole-corpus reference distribution.
    * The streaming side is a watermarked windowed count per (window,
    * bucket) — bounded state, Append-mode eviction via the sentinel
    * flush (the q66 harness); the reference distribution is a ~12-row
    * broadcast table, so scoring a drained window is map-side. All
    * arithmetic is integer (ppm via `div`), so the drift score is
    * engine-exact: both engines see identical per-window counts because
    * the streaming counts are hash-verified against the same windows
    * the oracle computes in batch.
    */
  val q110StreamDrift: QueryDef = QueryDef.sql(
    "q110_stream_drift",
    """WITH e AS (SELECT make_timestamp(CAST(3600000000 * (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) AS BIGINT)) AS bucket_ts,
      |            CAST(floor(value / 50) AS BIGINT) AS vb FROM events),
      |ref AS (SELECT vb, count(*) AS c FROM e GROUP BY 1),
      |rt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ref),
      |wc AS (SELECT bucket_ts, vb, count(*) AS c FROM e GROUP BY 1, 2),
      |wn AS (SELECT bucket_ts, CAST(sum(c) AS BIGINT) AS n_w FROM wc GROUP BY 1),
      |x AS (SELECT wn.bucket_ts, ref.vb,
      |        (1000000 * coalesce(wc.c, 0)) // wn.n_w AS ppm_w,
      |        (1000000 * ref.c) // rt.n AS ppm_ref,
      |        wn.n_w
      |      FROM wn CROSS JOIN ref CROSS JOIN rt
      |      LEFT JOIN wc ON wc.bucket_ts = wn.bucket_ts AND wc.vb = ref.vb)
      |SELECT bucket_ts AS bucket, min(n_w) AS n,
      |  CAST(sum(abs(ppm_w - ppm_ref)) // 2 AS BIGINT) AS tv_half_ppm
      |FROM x GROUP BY 1 ORDER BY 1""") { (s, d) =>
    val out = s"stream_drift_${runSeq.incrementAndGet()}"
    val drained = runToMemory(
      eventStream(s, stageEventsWithSentinels(s, d), oneFilePerBatch = true)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"),
          floor(col("value") / 50).cast("long").as("vb"))
        .agg(count(lit(1)).as("c")),
      out, OutputMode.Append)
    // sentinel events land in their own far-future windows — drop by
    // window time, not by type (the type column is aggregated away)
    val wc = drained.df
      .filter(col("window.start") < lit("2100-01-01").cast("timestamp"))
      .select(col("window.start").cast("timestamp_ntz").as("bucket_ts"),
        col("vb"), col("c"))
    val ref = graft.sources.Tables.events(s, d)
      .groupBy(floor(col("value") / 50).cast("long").as("vb"))
      .agg(count(lit(1)).as("rc"))
    val rt = ref.agg(sum(col("rc")).cast("long").as("n"))
    val wn = wc.groupBy(col("bucket_ts")).agg(sum(col("c")).cast("long").as("n_w"))
    wn.crossJoin(broadcast(ref)).crossJoin(broadcast(rt))
      .join(wc, Seq("bucket_ts", "vb"), "left")
      .select(col("bucket_ts"),
        (expr("(1000000 * coalesce(c, 0)) div n_w")).as("ppm_w"),
        (expr("(1000000 * rc) div n")).as("ppm_ref"),
        col("n_w"))
      .groupBy(col("bucket_ts").as("bucket"))
      .agg(min(col("n_w")).as("n"),
        expr("CAST(sum(abs(ppm_w - ppm_ref)) div 2 AS BIGINT)")
          .as("tv_half_ppm"))
      .orderBy(col("bucket"))
  }

  final case class QuotaHit(event_type: String, event_id: Long, ts_us: Long)

  /** Per-key quota admission as KEYED STREAMING STATE: admit the first
    * `cap` events per key in event-time order, then drop — 8 bytes of
    * state per key (the admitted count), whatever the feed length. The
    * ingest-control shape a 100 TB pipeline runs at the front door
    * (per-source sampling caps, abuse throttles, free-tier quotas).
    * Cross-batch order comes from the event-time-ordered replay
    * ([[stageEventsOrdered]]); within a batch the per-key slice sorts by
    * (ts, event_id) — the same bounded reorder buffer as the funnel
    * automaton. Admission is exactly-once: the count is monotone, so an
    * event admitted in batch i can never re-admit later.
    */
  def quotaAdmit(events: DataFrame, cap: Int): Dataset[QuotaHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"), col("event_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, QuotaHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (etype, rows, state: GroupState[Long]) =>
          var admitted = state.getOption.getOrElse(0L)
          val out = scala.collection.mutable.ListBuffer.empty[QuotaHit]
          rows.toArray.sortBy(r => (r._3, r._2)).foreach { case (_, id, us) =>
            if (admitted < cap) { admitted += 1; out += QuotaHit(etype, id, us) }
          }
          state.update(admitted)
          out.iterator
      }
  }

  /** STREAMING quota admission, oracle-verified against the batch
    * row_number formulation: the registered result rolls the admitted
    * stream up per event type (count, id checksum, last admitted
    * event-time), which must equal "first 150 per type by (ts,
    * event_id)" computed relationally — any dropped or re-admitted
    * event under batch-boundary carry breaks the id sum.
    */
  val q117StreamQuota: QueryDef = QueryDef.sql(
    "q117_stream_quota",
    """WITH e AS (SELECT event_type, event_id,
      |            CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
      |          FROM events),
      |r AS (SELECT event_type, event_id, us,
      |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY us, event_id)
      |          AS rn
      |      FROM e)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_admitted,
      |  CAST(sum(event_id) AS BIGINT) AS id_sum, max(us) AS last_us
      |FROM r WHERE rn <= 150 GROUP BY 1 ORDER BY 1""") { (s, d) =>
    val out = s"stream_quota_${runSeq.incrementAndGet()}"
    val hits = quotaAdmit(
      eventStream(s, stageEventsOrdered(s, d), oneFilePerBatch = true),
      cap = 150)
    runToMemory(hits.toDF(), out, OutputMode.Append).df
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_admitted"),
        sum(col("event_id")).cast("long").as("id_sum"),
        max(col("ts_us")).as("last_us"))
      .orderBy(col("event_type"))
  }

  def queries: Seq[QueryDef] =
    Seq(q66StreamTumbling, q67StreamSession, q70StreamDedup, q73StreamAlerts,
      q75StreamEnrich, q78StreamIncrDedup, q81StreamIntervalJoin,
      q83StreamOuterJoin, q88StreamFunnel, q96StreamDistinct, q99StreamPit,
      q104StreamHeavyHitters, q110StreamDrift, q117StreamQuota)
}
