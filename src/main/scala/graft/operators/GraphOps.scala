package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.QueryDef.{noOracle, sql}
import graft.functions.Exact._
import graft.sources.Tables._

/** Property-graph operators — reference surface SURVEY.md §2.G
  * (`neo4j_loader.py` + `cypher_queries.cypher`).
  *
  * The reference materializes a Neo4j graph (Player/Team/Match nodes,
  * FACED/PLAYED edges) and queries it in Cypher. Here the graph IS a pair
  * of DataFrames — `nodes(node)` and `edges(src, dst, props…)` — built
  * with the same semantics the loader encodes: MERGE-by-key = dropDuplicates
  * on the edge key (G4), node MERGE = distinct union of endpoint columns
  * (G2), GDS graph projection = the edge DataFrame itself (G8). Over the
  * driver's star schema the "FACED" analog is customer→supplier: one edge
  * per lineitem (ball), with quantity/price as edge properties.
  *
  * Scale posture: node/edge builders are distinct-aggregations (partial
  * dedup before shuffle); PageRank is the one iterative operator — each
  * step is edge⋈rank join (shuffle-hash on src; rank table ≪ edges, so
  * AQE broadcasts while it fits) + hash agg on dst, with localCheckpoint
  * every few iterations to truncate lineage growth.
  */
object GraphOps {

  /** FACED-analog edge list with properties: one row per lineitem,
    * src = customer node, dst = supplier node
    * (cf. `neo4j_loader.py:58-68` — one FACED edge per ball with
    * runs/isWicket properties).
    */
  def facedEdges(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(
        concat(lit("c"), col("o_custkey").cast("string")).as("src"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("dst"),
        col("l_quantity").as("qty"),
        col("l_extendedprice").as("price"),
        col("l_returnflag").as("flag"))

  /** Node table: distinct endpoints of the edge list (G2 MERGE-node
    * semantics; uniqueness-by-construction replaces the Neo4j unique
    * constraint, `neo4j_loader.py:28-30`).
    */
  def nodes(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()

  /** PageRank over (src, dst) edges — `gds.pageRank` equivalent
    * (`cypher_queries.cypher:27-34`). Fixed iteration count for
    * determinism.
    *
    * Dangling-node mass deliberately DECAYS rather than being
    * redistributed. This graph is bipartite customer→supplier, so every
    * supplier node is dangling and redistribution would change every
    * rank value — diverging from the reference's `gds.pageRank`
    * semantics (GDS power iteration likewise lets dangling mass leak
    * instead of spreading it). The cost argument is NOT the reason:
    * redistribution is one extra node-sized scalar aggregation per
    * iteration (the summed dangling rank folded into the teleport
    * term), trivial at any scale — parity with the reference engine is.
    * Rank VALUES therefore sum to < 1; orderings are unaffected for
    * rankings within a node class.
    *
    * The rank table stays node-sized (≪ edges), so by default each
    * iteration pins a broadcast of it — the edge side never shuffles,
    * and the only exchange per iteration is the node-sized contribs agg.
    * `broadcastRanks=false` falls back to AQE-chosen joins for graphs
    * whose node table outgrows the broadcast threshold.
    *
    * Fault tolerance: `localCheckpoint` (default) truncates lineage but
    * dies with an executor — fine on local mode; on a real cluster pass
    * `checkpointDir=Some(hdfsPath)` to use reliable `checkpoint()`
    * (identical results, pinned by `GraphOpsSpec`).
    */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85,
      broadcastRanks: Boolean = true,
      checkpointDir: Option[String] = None,
      edgesDistinct: Boolean = false): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    // setCheckpointDir is session-global; restore the caller's value so a
    // library call doesn't silently redirect unrelated jobs' checkpoints.
    // All checkpoint() calls below are eager, so every file this run
    // writes lands before the restore.
    val prevCheckpointDir = sc.getCheckpointDir
    checkpointDir.foreach(sc.setCheckpointDir)
    try {
      def pin(df: DataFrame): DataFrame =
        if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
      // edgesDistinct lets a caller holding a materialized distinct
      // projection (q24's session-cached artifact) skip a redundant
      // corpus-wide dedup shuffle + cache round-trip.
      val e =
        if (edgesDistinct) edges.select("src", "dst")
        else edges.select("src", "dst").distinct().cache()
      val outDeg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
      val eDeg = pin(e.join(outDeg, "src"))
      val ns = pin(nodes(e))
      val n = ns.count()
      if (!edgesDistinct) e.unpersist()
      var ranks = ns.withColumn("rank", lit(1.0 / n))
      for (i <- 1 to iters) {
        ranks = pageRankStep(eDeg, ns, ranks, damping, n, broadcastRanks)
        // checkpoint every 3rd iteration and the last: bounds lineage and
        // recompute to a 3-iteration chain while keeping the number of
        // eager materialization jobs low. A mid-run pin within 2
        // iterations of the end is skipped — the final pin covers it.
        if (i == iters || (i % 3 == 0 && iters - i >= 3)) ranks = pin(ranks)
      }
      ranks
    } finally if (checkpointDir.isDefined) sc.setCheckpointDir(prevCheckpointDir.orNull)
  }

  /** One PageRank iteration — broadcast-join → partial agg →
    * broadcast-left-join; both broadcast sides are node-sized, so no
    * wide shuffle of edges or nodes occurs (plan pinned by
    * `PlanAuditSpec`). */
  private[graft] def pageRankStep(eDeg: DataFrame, ns: DataFrame,
      ranks: DataFrame, damping: Double, n: Long,
      broadcastRanks: Boolean): DataFrame = {
    val rankSide = if (broadcastRanks) broadcast(ranks) else ranks
    val contribs = eDeg
      .join(rankSide, col("src") === col("node"))
      .select(col("dst").as("node"), (col("rank") / col("out_deg")).as("contrib"))
      .groupBy("node").agg(sum("contrib").as("msg"))
    val contribSide = if (broadcastRanks) broadcast(contribs) else contribs
    ns.join(contribSide, Seq("node"), "left")
      .select(col("node"),
        (lit((1 - damping) / n) +
          lit(damping) * coalesce(col("msg"), lit(0.0))).as("rank"))
  }

  /** Node inventory by type — G2 MERGE-node dedup, verified relationally. */
  val q21GraphNodes: QueryDef = sql(
    "q21_graph_nodes",
    """WITH e AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
      |                           's' || CAST(l_suppkey AS VARCHAR) AS dst
      |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e)
      |SELECT substr(node, 1, 1) AS node_type, count(*) AS n_nodes
      |FROM n GROUP BY 1 ORDER BY 1""") { (s, d) =>
    // endpoint-dedup without materializing the wide edge join: supplier
    // endpoints come straight from the fact scan; customer endpoints
    // from orders that actually appear in the fact (semi join on the
    // key only). Same node set as nodes(facedEdges(...)), one column
    // wide throughout.
    val srcNodes = orders(s, d)
      .join(lineitem(s, d).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(concat(lit("c"), col("o_custkey").cast("string")).as("node"))
    val dstNodes = lineitem(s, d)
      .select(concat(lit("s"), col("l_suppkey").cast("string")).as("node"))
    srcNodes.union(dstNodes).distinct()
      .groupBy(substring(col("node"), 1, 1).as("node_type"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("node_type"))
  }

  /** Per-node aggregation over incoming edges — E7/D2 graph agg
    * (`cypher_queries.cypher:11-16`: all bowlers faced, grouped by node):
    * edge count, exact property sum, distinct-partner count, top-k.
    */
  val q22GraphDegree: QueryDef = sql(
    "q22_graph_degree",
    """SELECT 's' || CAST(l_suppkey AS VARCHAR) AS node,
      |       count(*) AS n_edges,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
      |       count(DISTINCT o_custkey) AS n_partners
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1
      |ORDER BY n_edges DESC, node LIMIT 10""") { (s, d) =>
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(concat(lit("s"), col("l_suppkey").cast("string")).as("node"))
      .agg(
        count(lit(1)).as("n_edges"),
        sumd2(col("l_quantity")).as("total_qty"),
        countDistinct(col("o_custkey")).as("n_partners"))
      .orderBy(col("n_edges").desc, col("node"))
      .limit(10)
  }

  /** Point matchup lookup — D1 two-key edge filter + E4 global agg
    * (`cypher_queries.cypher:4-8` batter-vs-bowler head-to-head).
    * Parameterized (B12): the query entry binds defaults.
    */
  def matchup(s: SparkSession, d: String, custkey: Long, suppkey: Long): DataFrame =
    facedEdges(s, d)
      .filter(col("src") === s"c$custkey" && col("dst") === s"s$suppkey")
      .agg(
        count(lit(1)).as("n_interactions"),
        sumd2(col("qty")).as("total_qty"),
        sum(when(col("flag") === "R", 1).otherwise(0)).cast("long").as("n_returned"))

  val q23GraphMatchup: QueryDef = sql(
    "q23_graph_matchup",
    """SELECT count(*) AS n_interactions,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
      |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_custkey = 10 AND l_suppkey = 5""") { (s, d) =>
    matchup(s, d, 10, 5)
  }

  /** PageRank top-20 — G9. Not ANSI-SQL-expressible (iterative); the
    * driver records a rows-only check, and a golden ScalaTest pins exact
    * values on a fixed small graph. Ranks rounded to 9 digits so output
    * is stable across partition-order float summation.
    */
  val q24PageRank: QueryDef = noOracle("q24_graph_pagerank") { (s, d) =>
    // 4 iterations: on this bipartite customer→supplier graph the rounded
    // ranks are stationary to 1e-9 from iteration 4 (verified: identical
    // output at 4 vs 6 iterations at sf0.01 AND sf0.1); extra iterations
    // add stages without changing a single output digit.
    //
    // The distinct edge projection is a session-cached shared artifact —
    // the reference separates graph construction from ranking the same
    // way (`gds.graph.project` materializes once, `gds.pageRank` then
    // runs against the projection, `cypher_queries.cypher:27-34`), so
    // repeated rankings never re-run the fact⋈orders build.
    val projection = graft.SessionCache.checkpoint("graphProjection", s, d)(
      facedEdges(s, d).select("src", "dst").distinct())
    pageRank(projection, iters = 4, edgesDistinct = true)
      .select(col("node"), round(col("rank"), 9).as("rank"))
      .orderBy(col("rank").desc, col("node"))
      .limit(20)
  }

  def all: Seq[QueryDef] =
    Seq(q21GraphNodes, q22GraphDegree, q23GraphMatchup, q24PageRank)
}
