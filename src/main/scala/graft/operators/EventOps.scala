package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.QueryDef.sql
import graft.functions.Exact._
import graft.sources.Tables._

/** Time-window operators over the `events` table — SURVEY.md §2.H.
  *
  * The reference has no streaming surface (ingestion is an idempotent
  * batch re-run, `etl_cricsheet_to_mongo.py:131-145`); these are the
  * declared extension hooks, built on the exact primitives Structured
  * Streaming uses (`window`, `session_window`, `from_json`) so the same
  * aggregations run unchanged under `readStream` with a watermark (see
  * graft.streaming). Verified here in batch mode, where the semantics
  * are identical.
  *
  * Scale posture: window() is a projection (stays in whole-stage
  * codegen) + hash agg — no shuffle beyond the group-by; session
  * windows shuffle once on user_id. Event-time bucketing is
  * epoch-aligned arithmetic, so bucket boundaries are
  * partition-independent.
  */
object EventOps {

  /** Tumbling 1-hour windows per event type: count + exact sum. */
  val q17Tumbling: QueryDef = sql(
    "q17_events_tumbling",
    """SELECT make_timestamp(CAST(3600000000 * (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) AS BIGINT)) AS bucket,
      |       event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""") { (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumd2(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("bucket"), col("event_type"))
  }

  /** Sliding 10-minute windows every 5 minutes (each event lands in two
    * windows — Spark explodes the window set; the oracle reproduces the
    * expansion with an explicit 2-element unnest).
    */
  val q18Sliding: QueryDef = sql(
    "q18_events_sliding",
    """WITH x AS (SELECT CAST(ts AS TIMESTAMP) AS tsu, value FROM events),
      |w AS (SELECT unnest([
      |        make_timestamp(CAST(300000000 * (epoch_us(tsu) // 300000000) AS BIGINT)),
      |        make_timestamp(CAST(300000000 * (epoch_us(tsu) // 300000000) AS BIGINT)) - INTERVAL 5 MINUTE
      |      ]) AS wstart, tsu, value FROM x)
      |SELECT wstart, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM w
      |WHERE tsu >= wstart AND tsu < wstart + INTERVAL 10 MINUTE
      |GROUP BY 1
      |ORDER BY 1""") { (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"), sumd2(col("value")).as("sum_value"))
      .select(col("window.start").as("wstart"), col("n"), col("sum_value"))
      .orderBy(col("wstart"))
  }

  /** Session windows with a 30-minute inactivity gap per user. A session
    * breaks exactly when the gap to the previous event exceeds the
    * timeout; the oracle is the classic gaps-and-islands rewrite.
    * (user_id, ts) is unique in the data, so the island assignment is
    * deterministic.
    */
  val q19Session: QueryDef = sql(
    "q19_events_session",
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
    events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sumd2(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Embedded-JSON parsing (C10 `json.load` analogue for string columns):
    * `from_json` on the `props` payload, aggregated per event type. The
    * oracle extracts the integer with a regex so it does not depend on a
    * DuckDB JSON extension being loadable offline.
    */
  val q20JsonProps: QueryDef = sql(
    "q20_events_json",
    """SELECT event_type,
      |  CAST(sum(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) AS sum_k,
      |  max(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS max_k,
      |  count(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""") { (s, d) =>
    val k = from_json(col("props"),
      org.apache.spark.sql.types.StructType.fromDDL("k INT"))
      .getField("k").cast("long")
    events(s, d)
      .withColumn("k", k)
      .groupBy(col("event_type"))
      .agg(sum(col("k")).cast("long").as("sum_k"), max(col("k")).as("max_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** lag/lead navigation (window-function headroom, SURVEY §2.F): per
    * user, gap to the previous event and delta vs the next value.
    * (user_id, ts) is unique, so frames are deterministic. */
  val q41LagLead: QueryDef = sql(
    "q41_events_lag_lead",
    """WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu, value
      |           FROM events WHERE user_id < 10)
      |SELECT user_id, tsu AS ts,
      |  CAST(epoch_us(tsu) - epoch_us(lag(tsu) OVER w) AS BIGINT) AS gap_us,
      |  CAST(lead(value) OVER w - value AS DOUBLE) AS next_delta
      |FROM x WINDOW w AS (PARTITION BY user_id ORDER BY tsu)
      |ORDER BY user_id, tsu""") { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    events(s, d).filter(col("user_id") < 10)
      .select(col("user_id"), col("ts"),
        (unix_micros(col("ts").cast("timestamp")) -
          unix_micros(lag(col("ts"), 1).over(w).cast("timestamp")))
          .as("gap_us"),
        (lead(col("value"), 1).over(w) - col("value")).cast("double")
          .as("next_delta"))
      .orderBy(col("user_id"), col("ts"))
  }

  /** As-of join (not in the reference; flagship headroom operator):
    * each error event picks up the most recent click at-or-before it for
    * the same user. Spark lacks a native ASOF JOIN, so this composes it
    * the scalable way — union both sides tagged, one shuffle+sort per
    * user, and a last-non-null carry-forward window — rather than a
    * per-row subquery. The oracle uses DuckDB's native ASOF LEFT JOIN,
    * so the composition is verified against a real as-of implementation.
    */
  val q42AsofJoin: QueryDef = sql(
    "q42_asof_join",
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu, event_id, event_type FROM events),
      |err AS (SELECT user_id, tsu, event_id FROM e WHERE event_type = 'error'),
      |clk AS (SELECT user_id, tsu AS click_ts, event_id AS click_id FROM e WHERE event_type = 'click')
      |SELECT err.user_id, err.event_id, err.tsu AS ts, clk.click_id, clk.click_ts
      |FROM err ASOF LEFT JOIN clk
      |  ON err.user_id = clk.user_id AND err.tsu >= clk.click_ts
      |ORDER BY err.user_id, err.event_id""") { (s, d) =>
    val e = events(s, d)
    val clicks = e.filter(col("event_type") === "click").select(
      col("user_id"), col("ts").as("ord_ts"), lit(0).as("is_err"),
      lit(null).cast("long").as("event_id"),
      col("event_id").as("click_id"), col("ts").as("click_ts"))
    val errors = e.filter(col("event_type") === "error").select(
      col("user_id"), col("ts").as("ord_ts"), lit(1).as("is_err"),
      col("event_id"),
      lit(null).cast("long").as("click_id"),
      lit(null).cast(clicks.schema("click_ts").dataType).as("click_ts"))
    // a click at the same instant sorts before the error (>= semantics)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ord_ts"), col("is_err"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    clicks.union(errors)
      .withColumn("click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("is_err") === 1)
      .select(col("user_id"), col("event_id"), col("ord_ts").as("ts"),
        col("click_id"), col("click_ts"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Range (interval) join: event pairs of the same user within 5
    * minutes. A naive theta join is a nested loop; the scale
    * composition buckets time by the range width and turns it into an
    * equi-join — each left row joins buckets [b, b+1], so every
    * qualifying pair meets exactly once on a compact shuffle key, then
    * the exact range predicate filters. The oracle runs the plain
    * inequality join.
    */
  val q43RangeJoin: QueryDef = sql(
    "q43_range_join",
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu, event_id FROM events)
      |SELECT a.user_id, a.event_id AS id1, b.event_id AS id2,
      |       CAST(epoch_us(b.tsu) - epoch_us(a.tsu) AS BIGINT) AS gap_us
      |FROM e a JOIN e b
      |  ON a.user_id = b.user_id AND b.tsu > a.tsu
      |     AND b.tsu <= a.tsu + INTERVAL 5 MINUTE
      |ORDER BY a.user_id, id1, id2""") { (s, d) =>
    val width = 300000000L // 5 minutes in microseconds
    val e = events(s, d).select(col("user_id"), col("event_id"),
      col("ts"), unix_micros(col("ts").cast("timestamp")).as("us"))
    val left = e
      .withColumn("b", floor(col("us") / width).cast("long"))
      .withColumn("jb", explode(array(col("b"), col("b") + 1)))
      .select(col("user_id"), col("event_id").as("id1"),
        col("us").as("us1"), col("jb"))
    val right = e
      .select(col("user_id"), col("event_id").as("id2"),
        col("us").as("us2"),
        floor(col("us") / width).cast("long").as("b2"))
    left.join(right,
        left("user_id") === right("user_id") && col("jb") === col("b2"))
      .filter(col("us2") > col("us1") && col("us2") <= col("us1") + width)
      .select(left("user_id"), col("id1"), col("id2"),
        (col("us2") - col("us1")).as("gap_us"))
      .orderBy(col("user_id"), col("id1"), col("id2"))
  }

  /** Per-type z-score anomaly detection (monitoring / data-quality gate):
    * each event type's mean and population stddev, plus how many events
    * sit outside mean ± 2σ.
    *
    * Cross-engine exactness: both moments come from EXACT decimal sums —
    * Σv as DECIMAL(18,2) and Σv² as the decimal product (exact at scale
    * 4), rounded to scale 2 before the double cast so the cast itself is
    * exact (the q38/Exact.sumd rationale: a scale-2 decimal of this
    * magnitude converts identically in both engines, a wide scale-4 one
    * may not once the scaled integer passes 2^53). From there
    * mean/variance/threshold are the same IEEE double expressions over
    * identical inputs, so the outlier COMPARISON (and hence the counts)
    * is bit-deterministic, and the reported mean/std round at 6 digits.
    *
    * Scale shape: one hash-agg pass for the moments (map-side partial),
    * per-type stats broadcast back over a second scan for the outlier
    * count — never a window over the table (event_type is
    * low-cardinality; a per-type window would serialize each type's
    * whole history into one task).
    */
  val q71AnomalyZscore: QueryDef = sql(
    "q71_anomaly_zscore",
    """WITH b AS (SELECT event_type, value,
      |             CAST(value AS DECIMAL(18,2)) AS v FROM events),
      |s AS (SELECT event_type, count(*) AS n,
      |        CAST(sum(v) AS DOUBLE) AS sv,
      |        CAST(round(sum(v * v), 2) AS DOUBLE) AS sv2
      |      FROM b GROUP BY 1),
      |m AS (SELECT event_type, n, sv / n AS mean,
      |        sqrt(greatest(sv2 / n - (sv / n) * (sv / n), 0)) AS std FROM s),
      |o AS (SELECT b.event_type, count(*) AS n_outliers
      |      FROM b JOIN m USING (event_type)
      |      WHERE abs(b.value - m.mean) > 2 * m.std GROUP BY 1)
      |SELECT m.event_type, m.n,
      |  CAST(coalesce(o.n_outliers, 0) AS BIGINT) AS n_outliers,
      |  round(m.mean, 6) AS mean, round(m.std, 6) AS std
      |FROM m LEFT JOIN o USING (event_type)
      |ORDER BY m.event_type""") { (s, d) =>
    val b = events(s, d).select(col("event_type"), col("value"),
      dec2(col("value")).as("v"))
    val m = b.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).cast("double").as("sv"),
        round(sum(col("v") * col("v")), 2).cast("double").as("sv2"))
      .withColumn("mean", col("sv") / col("n"))
      // clamp at 0: cancellation can push the variance term epsilon-negative
      // for a near-constant type — Spark's sqrt would yield NaN but DuckDB's
      // RAISES on negative input, so the clamp keeps both engines defined
      // (and identical) on degenerate data. Same `greatest` in the oracle.
      .withColumn("std",
        sqrt(greatest(
          col("sv2") / col("n") - (col("sv") / col("n")) * (col("sv") / col("n")),
          lit(0d))))
    val o = b.join(broadcast(m.select(col("event_type"), col("mean"), col("std"))),
        Seq("event_type"))
      .filter(abs(col("value") - col("mean")) > lit(2) * col("std"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_outliers"))
    m.join(o, Seq("event_type"), "left")
      .select(col("event_type"), col("n"),
        coalesce(col("n_outliers"), lit(0L)).as("n_outliers"),
        round(col("mean"), 6).as("mean"), round(col("std"), 6).as("std"))
      .orderBy(col("event_type"))
  }

  /** Ordered funnel conversion (view → click → purchase within 48 h of
    * the view) — the sequential-pattern query class (Flink/Trino
    * MATCH_RECOGNIZE, ClickHouse windowFunnel) that plain relational
    * algebra states as a chained self-join. The oracle IS that 3-way
    * join; the registered plan is the scale shape: ONE shuffle on
    * user_id, then `flatMapSortedGroups` (Spark's secondary sort — the
    * per-user event stream arrives time-ordered from the shuffle sort,
    * never materialized per group) folding an O(1)-state automaton:
    *
    *   lastView  = latest view so far,
    *   bestStart = max over clicks so far of (latest view ≤ that click),
    *
    * and a purchase converts iff `p − bestStart ≤ W` — algebraically
    * `∃ v ≤ c ≤ p with p − v ≤ W` ⟺ `p − max_{c≤p} latestView(c) ≤ W`,
    * so the fold is exactly the join's semantics (FunnelSpec pins the
    * equivalence on adversarial orderings, the oracle pins it on data).
    * At 100 TB the join shape shuffles the events table three times and
    * explodes on active users; this shape shuffles it once and streams.
    * Ties sort view < click < purchase so the non-strict `≤` chain
    * matches the oracle at equal timestamps.
    */
  val q86Funnel: QueryDef = sql(
    "q86_funnel",
    """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS tsu FROM events),
      |v AS (SELECT user_id, tsu FROM e WHERE event_type = 'view'),
      |c AS (SELECT user_id, tsu FROM e WHERE event_type = 'click'),
      |p AS (SELECT user_id, tsu FROM e WHERE event_type = 'purchase')
      |SELECT p.user_id, CAST(epoch_us(min(p.tsu)) AS BIGINT) AS purchase_us
      |FROM p JOIN c ON c.user_id = p.user_id AND c.tsu <= p.tsu
      |       JOIN v ON v.user_id = c.user_id AND v.tsu <= c.tsu
      |             AND p.tsu <= v.tsu + INTERVAL 48 HOUR
      |GROUP BY p.user_id ORDER BY p.user_id""") { (s, d) =>
    import s.implicits._
    funnelConverted(
      events(s, d)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"),
          when(col("event_type") === "view", 0)
            .when(col("event_type") === "click", 1).otherwise(2).as("rank"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .as[(Long, Int, Long)],
      windowUs = 48L * 3600L * 1000000L)(s)
      .orderBy(col("user_id"))
  }

  /** The funnel automaton over (user_id, rank, us) rows; package-visible
    * so FunnelSpec can drive it with adversarial synthetic orderings. */
  private[graft] def funnelConverted(
      e: org.apache.spark.sql.Dataset[(Long, Int, Long)], windowUs: Long)(
      s: SparkSession): DataFrame = {
    import s.implicits._
    e.groupByKey(_._1)
      .flatMapSortedGroups(col("us"), col("rank")) { (uid, it) =>
        var lastView = Long.MinValue
        var bestStart = Long.MinValue
        var out: List[(Long, Long)] = Nil
        while (out.isEmpty && it.hasNext) {
          val (_, rank, us) = it.next()
          rank match {
            case 0 => if (us > lastView) lastView = us
            case 1 => if (lastView > bestStart) bestStart = lastView
            case _ =>
              if (bestStart != Long.MinValue && us - bestStart <= windowUs)
                out = List((uid, us))
          }
        }
        out
      }
      .toDF("user_id", "purchase_us")
  }

  /** Cohort retention matrix — the product-analytics staple every event
    * warehouse runs (Mixpanel/Amplitude retention, dbt cohort models):
    * users cohorted by FIRST-seen day, then for each (cohort day, day
    * offset) the count of cohort members active that day, plus the
    * cohort size and an integer-exact retention ratio in ppm
    * (`(1e6·n_active) div cohort_size` — integer division matches
    * bit-for-bit across engines, no float tolerance).
    *
    * Scale posture: first-seen is one hash agg on user_id; the join
    * back to events is on the same key, so the exchange is reused (no
    * second shuffle of the fact side); per-user-day dedup + the matrix
    * agg are map-side-combinable hash aggs. Nothing is user-collected;
    * every stage is key-partitioned — the shape survives a 100 TB feed.
    */
  val q90CohortRetention: QueryDef = sql(
    "q90_cohort_retention",
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu FROM events),
      |f AS (SELECT user_id, CAST(min(tsu) AS DATE) AS cohort_day
      |      FROM e GROUP BY 1),
      |x AS (SELECT DISTINCT e.user_id, f.cohort_day,
      |        date_diff('day', f.cohort_day, CAST(e.tsu AS DATE)) AS day_offset
      |      FROM e JOIN f USING (user_id)),
      |m AS (SELECT cohort_day, day_offset, count(*) AS n_active
      |      FROM x GROUP BY 1, 2),
      |w AS (SELECT cohort_day, day_offset, n_active,
      |        max(CASE WHEN day_offset = 0 THEN n_active END)
      |          OVER (PARTITION BY cohort_day) AS cohort_size
      |      FROM m)
      |SELECT cohort_day, day_offset, n_active, cohort_size,
      |  (1000000 * n_active) // cohort_size AS retention_ppm
      |FROM w ORDER BY 1, 2""") { (s, d) =>
    val e = events(s, d).select(col("user_id"), col("ts").as("tsu"))
    val f = e.groupBy(col("user_id"))
      .agg(to_date(min(col("tsu"))).as("cohort_day"))
    val x = e.join(f, "user_id")
      .select(col("user_id"), col("cohort_day"),
        datediff(to_date(col("tsu")), col("cohort_day"))
          .cast("long").as("day_offset"))
      .distinct()
    val m = x.groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
    // cohort size IS the matrix's own offset-0 row (everyone is active
    // on their first day): a window over the MATRIX — cohort-day ×
    // offset cardinality, nothing fact-sized — beats a self-join, whose
    // broadcast branch would re-run the whole fact pipeline
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_day"))
    m.withColumn("cohort_size",
        max(when(col("day_offset") === 0, col("n_active"))).over(w))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("cohort_size"),
        expr("(1000000 * n_active) div cohort_size").as("retention_ppm"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** SCD Type-2 dimension build from a change feed — the warehouse-ETL
    * operator that turns per-key event streams into versioned validity
    * intervals (Kimball slowly-changing dimensions; Delta/Iceberg MERGE
    * pipelines run this shape on every load). Per user, ordered by
    * event time: collapse runs of the same state (`event_type`), then
    * each surviving change opens a version valid [its ts, next change's
    * ts) — the current version's `valid_to` is NULL.
    *
    * Scale posture: ONE shuffle on user_id; the run-collapse lag and
    * the interval lead/version row_number share the identical
    * (partition, order) spec, so Catalyst plans a single sort under
    * both window groups. No joins, no driver state — per-key linear
    * work, the shape that holds at 100 TB of CDC feed.
    */
  val q91Scd2: QueryDef = sql(
    "q91_scd2_intervals",
    """WITH e AS (SELECT user_id, event_id, event_type AS state,
      |             CAST(ts AS TIMESTAMP) AS tsu FROM events),
      |ch AS (SELECT user_id, event_id, state, tsu,
      |         lag(state) OVER (PARTITION BY user_id
      |           ORDER BY tsu, event_id) AS prev
      |       FROM e),
      |k AS (SELECT user_id, event_id, state, tsu FROM ch
      |      WHERE prev IS NULL OR prev <> state)
      |SELECT user_id,
      |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
      |  state, tsu AS valid_from,
      |  lead(tsu) OVER w AS valid_to
      |FROM k WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
      |ORDER BY user_id, version""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"),
        col("event_type").as("state"), col("ts").as("tsu"))
      .withColumn("prev", lag(col("state"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("state"))
      .select(col("user_id"),
        row_number().over(w).cast("long").as("version"),
        col("state"), col("tsu").as("valid_from"),
        lead(col("tsu"), 1).over(w).as("valid_to"))
      .orderBy(col("user_id"), col("version"))
  }

  /** POINT-IN-TIME join — the feature-store operation that makes
    * training data leak-free: each fact row joins the dimension version
    * that was valid AT ITS EVENT TIME, never a later one. The dimension
    * here is q91's SCD2 change feed (contiguous validity intervals), so
    * PIT ≡ as-of to the change points: most recent valid_from ≤ ts. The
    * scalable form is q42's composition — union facts and version
    * starts, ONE shuffle on the entity key, and a last-non-null
    * carry-forward window (dim rows ordered before facts at equal ts,
    * so a fact at a change instant sees the NEW version, matching the
    * oracle's inclusive ASOF) — not the interval theta join a naive
    * formulation shuffles per bound. Output: events counted by the
    * state their user was in when they acted. Oracle: DuckDB's native
    * ASOF JOIN against the identical change feed.
    */
  val q97PitJoin: QueryDef = sql(
    "q97_pit_join",
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
      |SELECT state, event_type, count(*) AS n,
      |       count(DISTINCT user_id) AS users
      |FROM pit GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = events(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), col("ts").as("tsu"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu"), col("event_id"))
    // one change row per (user, instant): two same-microsecond change
    // events would make the carry-forward `last` (and the oracle's ASOF)
    // tie-ambiguous — the max-event_id change wins deterministically in
    // BOTH engines (no-op on data without (user_id, ts) duplicates, but
    // driver regeneration + ns→µs truncation can create them)
    val chW = Window.partitionBy(col("user_id"), col("tsu"))
      .orderBy(col("event_id").desc)
    val ch = e
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("rn", row_number().over(chW))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("tsu"),
        col("event_type").as("dim_state"))
    // union-carry: dim rows (is_fact=0) sort before facts (is_fact=1)
    // at equal ts — a fact at a change instant sees the new version
    val tagged = ch
      .select(col("user_id"), col("tsu"), lit(0).as("is_fact"),
        col("dim_state"), lit(null).cast("string").as("event_type"))
      .unionByName(e.select(col("user_id"), col("tsu"),
        lit(1).as("is_fact"), lit(null).cast("string").as("dim_state"),
        col("event_type")))
    val cw = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu"), col("is_fact"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("state", last(col("dim_state"), ignoreNulls = true).over(cw))
      .filter(col("is_fact") === 1)
      .groupBy(col("state"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("users"))
      .orderBy(col("state"), col("event_type"))
  }

  def all: Seq[QueryDef] =
    Seq(q17Tumbling, q18Sliding, q19Session, q20JsonProps, q41LagLead,
      q42AsofJoin, q43RangeJoin, q71AnomalyZscore, q86Funnel,
      q90CohortRetention, q91Scd2, q97PitJoin)
}
