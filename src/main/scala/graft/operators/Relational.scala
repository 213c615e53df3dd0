package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.QueryDef
import graft.QueryDef.sql
import graft.functions.Exact._
import graft.sources.Tables._

/** Relational operator inventory — reference surfaces SURVEY.md §2.B/D/E/F.
  *
  * Each query re-expresses one operator family the reference executes via
  * MongoDB aggregation pipelines (`/root/reference/mongo_analytics_examples.py`)
  * or Cypher (`/root/reference/cypher_queries.cypher`) as a declarative
  * Spark plan over the driver's star-schema testdata. Catalyst supplies
  * what the reference hand-encodes: predicate pushdown ($match-first),
  * column pruning (find() projections), TakeOrderedAndProject
  * ($sort+$limit), HAVING-after-agg (Cypher WITH...WHERE).
  *
  * Scale posture (100 TB): every aggregation is partial+final hash agg
  * (map-side combine before the shuffle); dimension joins broadcast the
  * small side; fact-fact joins shuffle on join keys only after filters
  * are pushed to the scans; top-k never materializes a full sort.
  */
object Relational {

  /** TPC-H Q1 shape = `runs_by_batter` pipeline shape
    * (`mongo_analytics_examples.py:18-29`): scan → filter → group →
    * multi-aggregate → derived columns. Exercises E1 (hash group-by,
    * multi-agg), B8 (arithmetic), B9 (post-agg compute), E2 (count).
    */
  val q01PricingSummary: QueryDef = sql(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(9,4))) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(9,4))) AS DECIMAL(18,6)) * (1 + CAST(l_tax AS DECIMAL(9,4)))), 2) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_qty,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '2001-06-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""") { (s, d) =>
    val li = lineitem(s, d)
    val discPrice =
      (dec2(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount"))))
        .cast(DecimalType(18, 6))
    li.filter(col("l_shipdate") < lit("2001-06-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumd2(col("l_quantity")).as("sum_qty"),
        sumd2(col("l_extendedprice")).as("sum_base_price"),
        sumd(discPrice).as("sum_disc_price"),
        sumd(discPrice * (lit(1) + dec4(col("l_tax")))).as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)))
          .cast("double").as("avg_qty"),
        (sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1)))
          .cast("double").as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Fact⋈dim join + group + top-k — D4 latent-key join
    * (`etl_cricsheet_to_mongo.py:91` matchId↔_id) + F1 sort-desc-limit
    * (`mongo_analytics_examples.py:26-27`). Customer side is
    * dimension-sized → broadcast; at 100 TB AQE converts or keeps
    * shuffle-hash depending on actual size.
    */
  val q02TopCustomers: QueryDef = sql(
    "q02_top_customers",
    """SELECT c_custkey, c_name,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
      |  count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY total_spent DESC, c_custkey LIMIT 10""") { (s, d) =>
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(sumd2(col("o_totalprice")).as("total_spent"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("total_spent").desc, col("c_custkey"))
      .limit(10)
  }

  /** Conjunctive equality filter + global (ungrouped) aggregate =
    * `kohli_vs_southee` (`mongo_analytics_examples.py:40-48`): B1 two-col
    * $match, E4 `$group {_id: None}`, E3 conditional sum via $cond.
    */
  val q03FilterGlobalAgg: QueryDef = sql(
    "q03_filter_global_agg",
    """SELECT count(*) AS n_rows,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(9,4))) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
      |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
      |  CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk
      |FROM lineitem
      |WHERE l_returnflag = 'R' AND l_linestatus = 'F'""") { (s, d) =>
    lineitem(s, d)
      .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
      .agg(
        count(lit(1)).as("n_rows"),
        sumd2(col("l_quantity")).as("sum_qty"),
        sumd((dec2(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount"))))
          .cast(DecimalType(18, 6))).as("revenue"),
        sum(when(col("l_discount") > 0.05, 1).otherwise(0)).cast("long")
          .as("n_discounted"),
        sum(when(col("l_quantity") >= 25, 1).otherwise(0)).cast("long")
          .as("n_bulk"))
  }

  /** Post-aggregation filter (HAVING) with a scalar-subquery threshold —
    * E6 (`cypher_queries.cypher:13` WHERE balls >= 30 after WITH...count).
    * Threshold is data-relative (avg group size) so the query stays
    * meaningful across scale factors.
    */
  val q04HavingThreshold: QueryDef = sql(
    "q04_having_threshold",
    """SELECT l_suppkey, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem
      |GROUP BY l_suppkey
      |HAVING count(*) >= (SELECT count(*) FROM lineitem) / (SELECT count(DISTINCT l_suppkey) FROM lineitem)
      |ORDER BY n DESC, l_suppkey""") { (s, d) =>
    val li = lineitem(s, d)
    val thr = li.agg(
      (count(lit(1)) / countDistinct(col("l_suppkey"))).as("thr"))
    li.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"), sumd2(col("l_quantity")).as("qty"))
      .crossJoin(broadcast(thr))
      .filter(col("n") >= col("thr"))
      .select(col("l_suppkey"), col("n"), col("qty"))
      .orderBy(col("n").desc, col("l_suppkey"))
  }

  /** Multi-key mixed-direction sort + limit — F2
    * (`cypher_queries.cypher:15-16` ORDER BY strikeRate ASC, outs DESC
    * LIMIT 10). Planner emits TakeOrderedAndProject: top-k per partition
    * then merged on the driver — no global sort at any scale.
    */
  val q05ToughestSuppliers: QueryDef = sql(
    "q05_topk_mixed_sort",
    """SELECT l_suppkey,
      |  CAST(CAST(sum(CAST(l_discount AS DECIMAL(9,4))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_disc,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY l_suppkey
      |ORDER BY avg_disc ASC, n DESC, l_suppkey LIMIT 10""") { (s, d) =>
    lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(
        (sum(dec4(col("l_discount"))).cast("double") / count(lit(1)))
          .cast("double").as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy(col("avg_disc").asc, col("n").desc, col("l_suppkey"))
      .limit(10)
  }

  /** 5-way star join: fact ⋈ orders ⋈ customer ⋈ nation ⋈ region with a
    * region filter — the D4 latent-key pattern at full width. nation and
    * region broadcast unconditionally (bounded-size dims at any scale);
    * customer is left to AQE (dimension at sf0.1, but ~1.5B rows at
    * 100 TB where a shuffle join on the key is correct).
    */
  val q06StarJoin: QueryDef = sql(
    "q06_star_join",
    """SELECT n_name,
      |  CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(9,4))) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""") { (s, d) =>
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(
        sumd((dec2(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount"))))
          .cast(DecimalType(18, 6))).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Self equi-join with theta predicate — D3 partnership shape
    * (`cypher_queries.cypher:19-25`): two edge sets joined on the shared
    * endpoint, `a <> b` (here `<` to emit each unordered pair once),
    * HAVING, top-k. Distinct-before-join shrinks the join input — the
    * same reason the reference MERGEs one edge per ball.
    */
  val q07SupplierPairs: QueryDef = sql(
    "q07_supplier_pairs",
    """WITH e AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
      |SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, count(*) AS co_orders
      |FROM e a JOIN e b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      |GROUP BY 1, 2
      |HAVING count(*) >= 10
      |ORDER BY co_orders DESC, s1, s2 LIMIT 20""") { (s, d) =>
    // One shuffle instead of a fact-fact self-join: group each order's
    // supplier set (bounded, ~7 per order), expand ordered pairs
    // map-side with indexed transforms, then count. At 100 TB the
    // self-join would shuffle the fact table twice and sort both sides;
    // this shuffles it once and the pair expansion is O(k²) per group.
    val sets = lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_suppkey"))).as("ss"))
    val pairs = sets.select(explode(flatten(
      transform(col("ss"), (x, i) =>
        transform(slice(col("ss"), i + lit(2), greatest(size(col("ss")) - i - 1, lit(0))),
          y => struct(x.as("s1"), y.as("s2")))))).as("p"))
    pairs
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(count(lit(1)).as("co_orders"))
      .filter(col("co_orders") >= 10)
      .orderBy(col("co_orders").desc, col("s1"), col("s2"))
      .limit(20)
  }

  /** Left-semi join (EXISTS) — free-from-Spark headroom flagged in
    * SURVEY.md §2.D: customers having at least one finished order,
    * rolled up by market segment.
    */
  val q08SemiJoin: QueryDef = sql(
    "q08_semi_join",
    """SELECT c_mktsegment, count(*) AS n_customers,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""") { (s, d) =>
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sumd2(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Left-anti join (NOT EXISTS): parts never shipped at max discount. */
  val q09AntiJoin: QueryDef = sql(
    "q09_anti_join",
    """SELECT p_partkey, p_brand FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_partkey = p_partkey AND l_discount = 0.1)
      |ORDER BY p_partkey""") { (s, d) =>
    part(s, d)
      .join(lineitem(s, d).filter(col("l_discount") === 0.1),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_brand"))
      .orderBy(col("p_partkey"))
  }

  /** Set operations (absent in the reference — SURVEY.md §2.F headroom):
    * symmetric difference of two order-derived customer sets via
    * UNION / INTERSECT / EXCEPT, all distinct-semantics.
    */
  val q10SetOps: QueryDef = sql(
    "q10_set_ops",
    """WITH a AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      |     b AS (SELECT o_custkey FROM orders WHERE o_totalprice > 300000),
      |     u AS (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b),
      |     i AS (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
      |SELECT o_custkey FROM u EXCEPT SELECT o_custkey FROM i
      |ORDER BY o_custkey""") { (s, d) =>
    val o = orders(s, d)
    val a = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val b = o.filter(col("o_totalprice") > 300000).select(col("o_custkey"))
    a.union(b).distinct()
      .except(a.intersect(b))
      .orderBy(col("o_custkey"))
  }

  /** Distinct aggregation — SURVEY.md §2.E headroom (absent in the
    * reference): exact countDistinct alongside plain aggregates.
    */
  val q11DistinctAgg: QueryDef = sql(
    "q11_distinct_agg",
    """SELECT c_mktsegment,
      |  count(DISTINCT c_nationkey) AS n_nations,
      |  count(*) AS n_customers,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""") { (s, d) =>
    customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"),
        sumd2(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** ROLLUP hierarchy totals — §2.E headroom. Null grouping markers are
    * coalesced to 'ALL' so null-ordering differences between engines
    * cannot affect the compare.
    */
  val q12Rollup: QueryDef = sql(
    "q12_rollup",
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |       coalesce(l_linestatus, 'ALL') AS ls,
      |       count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""") { (s, d) =>
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sumd2(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy(col("rf"), col("ls"))
  }

  /** CUBE over two dims — §2.E headroom, same null-coalescing contract. */
  val q13Cube: QueryDef = sql(
    "q13_cube",
    """SELECT coalesce(o_orderstatus, 'ALL') AS st,
      |       coalesce(o_orderpriority, 'ALL') AS pri,
      |       count(*) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY st, pri""") { (s, d) =>
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumd2(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
        col("n"), col("sum_price"))
      .orderBy(col("st"), col("pri"))
  }

  /** Exact percentiles (median / p90) — §2.E headroom. Spark `percentile`
    * and DuckDB `quantile_cont` share the linear-interpolation definition,
    * so exact equality holds on identical inputs.
    */
  val q14Percentile: QueryDef = sql(
    "q14_percentile",
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS med_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""") { (s, d) =>
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("med_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Window top-N per group (row_number) — §2.F headroom: the reference's
    * leaderboards are group-then-topk; this is the per-group variant.
    * Fully tie-broken ordering keeps row_number deterministic.
    */
  val q15WindowRank: QueryDef = sql(
    "q15_window_rank",
    """SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber, rn
      |FROM (SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
      |        ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey) AS rn
      |      FROM lineitem) t
      |WHERE rn <= 3
      |ORDER BY l_returnflag, rn""") { (s, d) =>
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("l_returnflag"), col("rn"))
  }

  /** Running total per order (the "worm chart" shape from SURVEY.md §2.F):
    * pre-aggregated to a unique (order, line) grain — (l_orderkey,
    * l_linenumber) is NOT unique in the data, and a running frame over
    * duplicate sort keys would be nondeterministic — then an exact
    * decimal prefix sum over an unbounded-preceding frame.
    */
  val q16WindowRunning: QueryDef = sql(
    "q16_window_running",
    """WITH base AS (
      |  SELECT l_orderkey, l_linenumber,
      |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_d
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_orderkey, l_linenumber,
      |  CAST(sum(qty_d) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty
      |FROM base
      |ORDER BY l_orderkey, l_linenumber""") { (s, d) =>
    val base = lineitem(s, d)
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(sum(dec2(col("l_quantity"))).as("qty_d"))
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .select(col("l_orderkey"), col("l_linenumber"),
        sum(col("qty_d")).over(w).cast("double").as("run_qty"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Explicit GROUPING SETS (the general form behind rollup/cube). */
  val q45GroupingSets: QueryDef = sql(
    "q45_grouping_sets",
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |       coalesce(l_linestatus, 'ALL') AS ls,
      |       count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
      |ORDER BY rf, ls""") { (s, d) =>
    lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sumd2(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy(col("rf"), col("ls"))
  }

  /** Pivot: order status columns per priority (long→wide); the oracle is
    * the equivalent conditional aggregation. */
  val q46Pivot: QueryDef = sql(
    "q46_pivot",
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "P"
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""") { (s, d) =>
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sumd2(col("o_totalprice")))
      .orderBy(col("o_orderpriority"))
  }

  /** Unpivot (wide→long): per-flag aggregates melted to (metric, value)
    * rows; the oracle is the canonical UNION ALL. */
  val q47Unpivot: QueryDef = sql(
    "q47_unpivot",
    """WITH a AS (SELECT l_returnflag,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
      |UNION ALL
      |SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM a
      |ORDER BY l_returnflag, metric""") { (s, d) =>
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(sumd2(col("l_quantity")).as("sum_qty"),
        sumd2(col("l_extendedprice")).as("sum_price"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price")), "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))
  }

  def all: Seq[QueryDef] = Seq(
    q01PricingSummary, q02TopCustomers, q03FilterGlobalAgg,
    q04HavingThreshold, q05ToughestSuppliers, q06StarJoin, q07SupplierPairs,
    q08SemiJoin, q09AntiJoin, q10SetOps, q11DistinctAgg, q12Rollup, q13Cube,
    q14Percentile, q15WindowRank, q16WindowRunning, q45GroupingSets,
    q46Pivot, q47Unpivot)
}
