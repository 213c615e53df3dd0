package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cricket ETL — reference parity for the ingestion dataflow
  * (`/root/reference/etl_cricsheet_to_mongo.py`) re-expressed as one lazy
  * Spark plan: whole-file JSON scan → coalesce-chain normalization →
  * 3-level explode → derived flags → parquet sinks. The reference's
  * per-file Python loop (single process, single thread, `:128-145`)
  * becomes a parallel `FileSourceScan`; its hand-rolled v1.0.0/v1.1.0
  * polymorphism (`:79-89`) becomes schema-tolerant column selection:
  * a field reference that does not exist in the corpus resolves to a
  * typed null, exactly like `dict.get`.
  *
  * Known deviations (documented, tested):
  *  - `_id` is always a string (the reference can produce an int
  *    `match_number` id, a Python artifact of untyped fallbacks).
  *  - `result` is null when `winner` is null (Python would interpolate
  *    the string "None").
  *  - `innings` is int-typed via the `innings|number` chain; the
  *    reference's final `|team` fallback (a string in an int field) is
  *    dropped.
  *  - `info.officials` is null (not `{}`) when a corpus lacks the field.
  *  - a mixed v1.0.0+v1.1.0 directory is supported: conflicting field
  *    shapes (scalar vs dict `runs`, dict vs array `wickets`) infer as
  *    raw JSON strings and normalize through the try_cast/from_json
  *    fallbacks below (fixture-tested in `CricketEtlSpec`).
  *
  * Scale posture: ingestion of N match files is embarrassingly parallel
  * (one task per file split); normalization and explode are pure
  * projections (no shuffle); the only shuffles are the graph builders'
  * dedups, each on a compact composite key.
  */
object CricketEtl {

  /** A1 directory JSON scan: one row per match file. Only `*.json` files
    * are read (`etl_cricsheet_to_mongo.py:128` — `f.endswith(".json")`):
    * a stray README in the corpus directory is ignored, not ingested as
    * `_corrupt_record` rows. */
  def readMatches(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("multiLine", true)
      .option("pathGlobFilter", "*.json")
      .json(dir)

  // ---- schema-tolerant access (dict.get semantics) -------------------

  private def has(st: StructType, path: Seq[String]): Boolean = path match {
    case Seq() => true
    case head +: rest => st.fields.find(_.name == head) match {
      case Some(StructField(_, s: StructType, _, _)) => has(s, rest)
      case Some(_) => rest.isEmpty
      case None => false
    }
  }

  /** top-level dot-path or typed null when absent from the corpus. */
  private def opt(df: DataFrame, path: String): Column =
    if (has(df.schema, path.split('.').toSeq)) col(path)
    else lit(null)

  /** struct-field access on a bound column, or typed null when absent. */
  private def optF(st: StructType, parent: Column, name: String): Column =
    if (has(st, Seq(name))) parent.getField(name) else lit(null)

  private def structTypeOf(df: DataFrame, path: String): StructType = {
    def walk(st: StructType, p: Seq[String]): DataType = p match {
      case Seq() => st
      case head +: rest => st.fields.find(_.name == head).map(_.dataType) match {
        case Some(s: StructType) => if (rest.isEmpty) s else walk(s, rest)
        case Some(ArrayType(s: StructType, _)) =>
          if (rest.isEmpty) s else walk(s, rest)
        case Some(other) => other
        case None => new StructType()
      }
    }
    walk(df.schema, path.split('.').toSeq) match {
      case s: StructType => s
      case _ => new StructType()
    }
  }

  // ---- match normalization (B3/B5/C1-C8) -----------------------------

  /** `_id` fallback chain (`etl_cricsheet_to_mongo.py:31,52`):
    * match_id | registry.match | event.match_number | city+"-"+date. */
  private def matchIdCol(raw: DataFrame): Column = {
    val dateStr = element_at(coalesce(opt(raw, "info.dates"),
      array().cast("array<string>")), 1)
    coalesce(
      opt(raw, "info.match_id").cast("string"),
      opt(raw, "info.registry.match").cast("string"),
      opt(raw, "info.event.match_number").cast("string"),
      concat(coalesce(opt(raw, "info.city").cast("string"), lit("")),
        lit("-"), coalesce(dateStr, lit(""))))
  }

  /** One row per match: fixed shape regardless of source version
    * (`normalize_match`, `etl_cricsheet_to_mongo.py:28-68`). */
  def normalizeMatches(raw: DataFrame): DataFrame = {
    val dates = coalesce(opt(raw, "info.dates").cast("array<string>"),
      array().cast("array<string>"))
    val dateStr = element_at(dates, 1)
    val winner = opt(raw, "info.outcome.winner").cast("string")
    val byRuns = opt(raw, "info.outcome.by.runs").cast("long")
    val byWkts = opt(raw, "info.outcome.by.wickets").cast("long")
    // C1 result text + B6 branch structure (`etl:42-49`)
    val result = when(byRuns.isNotNull,
        format_string("%s won by %d runs", winner, byRuns))
      .when(byWkts.isNotNull,
        format_string("%s won by %d wickets", winner, byWkts))
      .otherwise(opt(raw, "info.outcome.result").cast("string"))
    raw.select(
      matchIdCol(raw).as("_id"),
      struct(
        dates.as("dates"),
        opt(raw, "info.team_type").cast("string").as("team_type"),
        opt(raw, "info.match_type").cast("string").as("match_type"),
        opt(raw, "info.gender").cast("string").as("gender"),
        coalesce(opt(raw, "info.teams").cast("array<string>"),
          array().cast("array<string>")).as("teams"),
        opt(raw, "info.venue").cast("string").as("venue"),
        opt(raw, "info.city").cast("string").as("city"),
        // officials pass through with their inferred shape (`etl:61` —
        // `info.get("officials", {})`); null when the corpus lacks them
        // (the typed-null analog of the reference's `{}` default).
        opt(raw, "info.officials").as("officials")).as("info"),
      struct(winner.as("winner"), result.as("result")).as("outcome"),
      // C3 tolerant ISO date parse (`etl:33-37`): null on garbage
      try_to_timestamp(dateStr).as("date"),
      opt(raw, "meta.data_version").cast("string").as("source_version"))
  }

  // ---- delivery flattening (the iter_deliveries dataflow, §3.1) ------

  /** 3-level unnest + version-tolerant field selection + derived flags
    * (`iter_deliveries`, `etl_cricsheet_to_mongo.py:70-106`). One flat
    * row per ball — the analytics fact table.
    */
  /** fixed output schema — also what an all-empty corpus yields. */
  private val deliverySchema: StructType = StructType.fromDDL(
    "matchId STRING, innings INT, battingTeam STRING, over INT, " +
      "ball INT, batter STRING, nonStriker STRING, bowler STRING, " +
      "runs_batter BIGINT, runs_extras BIGINT, runs_total BIGINT, " +
      "wickets ARRAY<STRUCT<kind: STRING, player_out: STRING>>, " +
      "is_boundary INT, is_dot INT")

  private def emptyDeliveries(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], deliverySchema)

  /** the field iff it is an array of structs (explodable nesting). */
  private def arrayStruct(st: StructType, name: String): Option[StructType] =
    st.fields.find(_.name == name).map(_.dataType).collect {
      case ArrayType(s: StructType, _) => s
    }

  def deliveries(raw: DataFrame): DataFrame = {
    // a corpus with no (or non-record) innings yields no deliveries —
    // same as the reference's inner loops never executing (`etl:73-78`).
    if (arrayStruct(raw.schema, "innings").isEmpty)
      return emptyDeliveries(raw.sparkSession)
    val s1 = raw.select(matchIdCol(raw).as("matchId"),
      explode(col("innings")).as("inn"))
    val innSt = structTypeOf(s1, "inn")
    if (arrayStruct(innSt, "overs").isEmpty)
      return emptyDeliveries(raw.sparkSession)
    val s2 = s1.select(
      col("matchId"),
      // `innings | number` chain (`etl:74`); the reference's final
      // `| team` string fallback is dropped (typed int column).
      coalesce(optF(innSt, col("inn"), "innings").cast("int"),
        optF(innSt, col("inn"), "number").cast("int")).as("innings"),
      optF(innSt, col("inn"), "team").cast("string").as("battingTeam"),
      explode(optF(innSt, col("inn"), "overs")).as("ov"))
    val ovSt = structTypeOf(s2, "ov")
    if (arrayStruct(ovSt, "deliveries").isEmpty)
      return emptyDeliveries(raw.sparkSession)
    val s3 = s2.select(
      col("matchId"), col("innings"), col("battingTeam"),
      optF(ovSt, col("ov"), "over").cast("int").as("over"),
      explode(optF(ovSt, col("ov"), "deliveries")).as("d"))
    val dSt = structTypeOf(s3, "d")

    // runs polymorphism (`etl:83-86`): dict in v1.1.0, scalar in v1.0.0.
    // A mixed-version corpus makes Spark's JSON inference keep the raw
    // JSON text (StringType) — handled via try_cast/get_json_object.
    val runsType = dSt.fields.find(_.name == "runs").map(_.dataType)
    val (batterRuns, extras, totalRuns) = runsType match {
      case Some(s: StructType) =>
        val b = coalesce(optF(s, col("d.runs"), "batter").cast("long"), lit(0L))
        val e = coalesce(optF(s, col("d.runs"), "extras").cast("long"), lit(0L))
        val t = coalesce(optF(s, col("d.runs"), "total").cast("long"), b + e)
        (b, e, t)
      case Some(_: StringType) =>
        val b = coalesce(expr("try_cast(d.runs AS BIGINT)"),
          get_json_object(col("d.runs"), "$.batter").cast("long"), lit(0L))
        val e = coalesce(
          get_json_object(col("d.runs"), "$.extras").cast("long"), lit(0L))
        val t = coalesce(
          get_json_object(col("d.runs"), "$.total").cast("long"), b + e)
        (b, e, t)
      case Some(_) =>
        val b = coalesce(optF(dSt, col("d"), "runs").cast("long"), lit(0L))
        (b, lit(0L), b + lit(0L))
      case None => (lit(0L), lit(0L), lit(0L))
    }

    // wickets polymorphism (`etl:87-89`): array | single dict | absent;
    // Python `or` treats an empty list as absent — hence when(size>0).
    val wicketTargetType = "array<struct<kind:string,player_out:string>>"
    def wicketArr(name: String): Option[Column] =
      dSt.fields.find(_.name == name).flatMap { f =>
        f.dataType match {
          case ArrayType(s: StructType, _) =>
            Some(transform(col(s"d.$name"), w => struct(
              optF(s, w, "kind").cast("string").as("kind"),
              optF(s, w, "player_out").cast("string").as("player_out"))))
          case s: StructType =>
            Some(when(col(s"d.$name").isNotNull, array(struct(
              optF(s, col(s"d.$name"), "kind").cast("string").as("kind"),
              optF(s, col(s"d.$name"), "player_out").cast("string")
                .as("player_out")))))
          case _: StringType =>
            // mixed corpus: raw JSON text, array or single object
            val asArr = from_json(col(s"d.$name"),
              org.apache.spark.sql.types.DataType.fromDDL(wicketTargetType))
            val asOne = from_json(col(s"d.$name"),
              StructType.fromDDL("kind STRING, player_out STRING"))
            Some(coalesce(asArr,
              when(asOne.isNotNull, array(asOne.cast(
                "struct<kind:string,player_out:string>")))))
          case _ => None
        }
      }
    val wicketCandidates =
      (wicketArr("wickets").toSeq ++ wicketArr("wicket").toSeq)
    val emptyW = array().cast("array<struct<kind:string,player_out:string>>")
    val wickets = wicketCandidates
      .foldRight(emptyW) { (cand, rest) =>
        when(cand.isNotNull && size(cand) > 0, cand).otherwise(rest)
      }

    s3.select(
      col("matchId"), col("innings"), col("battingTeam"), col("over"),
      optF(dSt, col("d"), "ball").cast("int").as("ball"),
      // `batter | striker`, `non_striker | nonStriker` (`etl:80-81`)
      coalesce(optF(dSt, col("d"), "batter").cast("string"),
        optF(dSt, col("d"), "striker").cast("string")).as("batter"),
      coalesce(optF(dSt, col("d"), "non_striker").cast("string"),
        optF(dSt, col("d"), "nonStriker").cast("string")).as("nonStriker"),
      optF(dSt, col("d"), "bowler").cast("string").as("bowler"),
      batterRuns.as("runs_batter"),
      extras.as("runs_extras"),
      totalRuns.as("runs_total"),
      wickets.as("wickets"),
      // B7 derived flags (`etl:104-105`)
      batterRuns.isin(4L, 6L).cast("int").as("is_boundary"),
      (totalRuns === 0L).cast("int").as("is_dot"))
  }

  /** A2/A3 sinks: idempotent whole-dataset overwrite replaces the
    * reference's per-key upsert + unordered bulk insert. Duplicate `_id`s
    * resolve deterministically last-write-wins in sorted-filename order —
    * the same row the reference's `replace_one` upsert over sorted files
    * keeps (`etl:128-136`) — via an `input_file_name`-ordered window, not
    * an arbitrary-row `dropDuplicates`. */
  def writeTables(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    val raw = readMatches(spark, srcDir)
    val w = Window.partitionBy("_id").orderBy(col("_src").desc)
    normalizeMatches(raw)
      .withColumn("_src", input_file_name())
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_src", "_rn")
      .write.mode("overwrite").parquet(s"$outDir/matches")
    deliveries(raw)
      .write.mode("overwrite").parquet(s"$outDir/deliveries")
  }

  /** A2 incremental path: per-row upsert (`replace_one(upsert=True)`,
    * `etl_cricsheet_to_mongo.py:136`) on top of dynamic partition
    * overwrite. `writeTables` models the reference's full reload; this
    * is the nightly-ingest shape at 100 TB: partition by a coarse
    * business key, rewrite only the partitions the delta touches, never
    * the table.
    *
    * A partition is "touched" if the delta writes into it OR it holds a
    * stale copy of a delta `_id` (a match whose `match_type` changed
    * between ingests moves partitions; the old row must go). Touched
    * partitions are rewritten as delta rows ∪ their existing
    * not-superseded rows, so `_id` stays unique table-wide and
    * untouched partitions are never read or written.
    */
  def upsertMatchesByPartition(spark: SparkSession, srcDir: String,
      outDir: String): Unit = {
    val w = Window.partitionBy("_id").orderBy(col("_src").desc)
    val delta = normalizeMatches(readMatches(spark, srcDir))
      .withColumn("_src", input_file_name())
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_src", "_rn")
      .withColumn("p_type",
        coalesce(col("info.match_type"), lit("unknown")))
    // first load, or a missing/empty target, degrades to a plain write
    val tableExists =
      scala.util.Try(spark.read.parquet(outDir).isEmpty).toOption.contains(false)
    // the partition key is a coarse business key (match_type: a handful
    // of values by design), so the touched-partition LIST is driver-sized
    // even at 100 TB; collecting it buys partition pruning on the
    // existing scan and lets us detect partitions the delta empties.
    val (toWrite, emptied) =
      if (!tableExists) (delta, Seq.empty[String])
      else {
        val existing = spark.read.parquet(outDir)
        val deltaIds = broadcast(delta.select("_id"))
        // partitions the delta lands in, plus old homes of delta _ids
        val touched = delta.select("p_type")
          .union(existing.join(deltaIds, Seq("_id"), "left_semi")
            .select("p_type"))
          .distinct().collect().map(_.getString(0)).toSeq
        val keep = existing
          .filter(col("p_type").isin(touched: _*))
          .join(deltaIds, Seq("_id"), "left_anti")
        // materialize before the write: the output partitions are also
        // inputs, and a file-source overwrite of a path it reads is
        // (rightly) rejected. Local checkpoint is fine at delta scale —
        // only touched partitions' survivors are held; on a cluster
        // use a reliable checkpoint/staging dir instead.
        val out = delta.unionByName(keep).localCheckpoint()
        // a partition whose every row was superseded writes no rows, so
        // dynamic overwrite would leave its stale files — drop it by hand
        val written = out.select("p_type").distinct()
          .collect().map(_.getString(0)).toSet
        (out, touched.filterNot(written))
      }
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try toWrite.write.mode("overwrite").partitionBy("p_type").parquet(outDir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    if (emptied.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(outDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach { v =>
        fs.delete(new org.apache.hadoop.fs.Path(outDir, s"p_type=$v"), true)
      }
    }
  }

  // ---- graph builders (§2.G, `neo4j_loader.py`) ----------------------

  /** B2 validation filter (`neo4j_loader.py:56-57,104-110`). */
  def validDeliveries(deliv: DataFrame): DataFrame =
    deliv.filter(col("batter").isNotNull && col("bowler").isNotNull &&
      col("matchId").isNotNull && col("over").isNotNull)

  /** G2 Player MERGE: distinct endpoint names (unique by construction,
    * replacing the Neo4j constraint `neo4j_loader.py:28`). */
  def players(deliv: DataFrame): DataFrame = {
    val v = validDeliveries(deliv)
    v.select(col("batter").as("name"))
      .union(v.select(col("bowler").as("name")))
      .distinct()
  }

  /** G4+G5 FACED edges: MERGE key (matchId, innings, over,
    * coalesce(ball,-1), batter, bowler) with last-write-wins properties
    * (`neo4j_loader.py:58-68`). `ord` is the ingest order column that
    * defines "last" (the reference's sorted-file order, `etl:129`).
    */
  def facedEdges(deliv: DataFrame, ord: Column): DataFrame = {
    val keyed = validDeliveries(deliv)
      .withColumn("ball_k", coalesce(col("ball"), lit(-1)))
      .withColumn("is_wicket",
        (size(coalesce(col("wickets"),
          array().cast("array<struct<kind:string,player_out:string>>"))) > 0)
          .cast("int"))
    val w = Window
      .partitionBy("matchId", "innings", "over", "ball_k", "batter", "bowler")
      .orderBy(ord.desc)
    keyed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("batter").as("src"), col("bowler").as("dst"),
        col("matchId"), col("innings"), col("over"),
        col("ball_k").as("ball"),
        coalesce(col("runs_total"), lit(0L)).as("runs"),
        col("is_wicket").as("isWicket"),
        col("battingTeam").as("team"))
  }

  /** G3 Match-node MERGE with ON CREATE / ON MATCH coalesce =
    * first-non-null-wins per property in `ord` order
    * (`neo4j_loader.py:37-43`). */
  def matchNodes(matches: DataFrame, ord: Column): DataFrame = {
    def fw(name: String, c: Column): Column =
      min_by(c, when(c.isNotNull, ord).otherwise(lit(Long.MaxValue))).as(name)
    matches.groupBy(col("_id").as("id"))
      .agg(
        fw("date", col("date")),
        fw("type", col("info.match_type")),
        fw("gender", col("info.gender")),
        fw("winner", col("outcome.winner")))
      .toDF("id", "date", "type", "gender", "winner")
  }

  /** G7 PLAYED edges: team↔match membership via explode of info.teams
    * (`neo4j_loader.py:44-46`), deduped like MERGE. */
  def playedEdges(matches: DataFrame): DataFrame =
    matches.select(col("_id").as("matchId"),
        explode(col("info.teams")).as("team"))
      .distinct()

  // ---- analytics (B-surface pipelines re-expressed) ------------------

  /** `runs_by_batter` (`mongo_analytics_examples.py:18-29`): E1 group +
    * B9 post-agg strikeRate/boundaryPct + F1 topk. */
  def runsByBatter(deliv: DataFrame, limit: Int = 10): DataFrame =
    deliv.groupBy(col("batter"))
      .agg(
        sum(col("runs_batter")).as("runs"),
        count(lit(1)).as("balls"),
        sum(col("is_boundary")).as("boundaries"))
      .withColumn("strikeRate", col("runs") / col("balls") * 100)
      .withColumn("boundaryPct", col("boundaries") / col("balls") * 100)
      .orderBy(col("runs").desc, col("batter"))
      .limit(limit)

  /** `wickets_by_bowler` (`mongo_analytics_examples.py:31-38`): B4
    * pre-agg projection + E3 conditional sum + F1 topk. */
  def wicketsByBowler(deliv: DataFrame, limit: Int = 10): DataFrame =
    deliv
      .select(col("bowler"),
        (size(coalesce(col("wickets"),
          array().cast("array<struct<kind:string,player_out:string>>"))) > 0)
          .cast("int").as("wkts"))
      .groupBy(col("bowler"))
      .agg(sum(col("wkts")).as("wickets"))
      .orderBy(col("wickets").desc, col("bowler"))
      .limit(limit)

  /** `kohli_vs_southee` head-to-head (`mongo_analytics_examples.py:40-48`
    * and Cypher (a)): B1 equality filter + E4 global agg. */
  def headToHead(deliv: DataFrame, batter: String, bowler: String): DataFrame =
    deliv.filter(col("batter") === batter && col("bowler") === bowler)
      .agg(
        count(lit(1)).as("balls"),
        sum(col("runs_total")).as("runs"),
        sum((size(coalesce(col("wickets"),
          array().cast("array<struct<kind:string,player_out:string>>"))) > 0)
          .cast("int")).as("outs"))

  /** Cypher (b) toughest bowlers: one-sided expansion + HAVING +
    * mixed-direction topk (`cypher_queries.cypher:10-16`). */
  def toughestBowlers(deliv: DataFrame, batter: String,
      minBalls: Int = 30, limit: Int = 10): DataFrame =
    deliv.filter(col("batter") === batter)
      .groupBy(col("bowler"))
      .agg(
        count(lit(1)).as("balls"),
        sum(col("runs_total")).as("runs"),
        sum((size(coalesce(col("wickets"),
          array().cast("array<struct<kind:string,player_out:string>>"))) > 0)
          .cast("int")).as("outs"))
      .filter(col("balls") >= minBalls)
      .withColumn("strikeRate",
        col("runs").cast("double") / col("balls") * 100)
      .orderBy(col("strikeRate").asc, col("outs").desc, col("bowler"))
      .limit(limit)

  /** Cypher (c) partnership proxy: D3 self equi-join on shared bowler
    * with theta filter a<>b (`cypher_queries.cypher:19-25`). Faithful to
    * the Cypher semantics: counts ordered pairs of FACED edge pairs.
    */
  def partnerships(faced: DataFrame, team: String,
      minCo: Long = 20, limit: Int = 20): DataFrame = {
    val t = faced.filter(col("team") === team)
    val a = t.select(col("src").as("a"), col("dst").as("bow"))
    val b = t.select(col("src").as("b"), col("dst").as("bow2"))
    a.join(b, col("bow") === col("bow2") && col("a") =!= col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("co_appearances"))
      .filter(col("co_appearances") >= minCo)
      .orderBy(col("co_appearances").desc, col("a"), col("b"))
      .limit(limit)
  }

  /** Cypher (d)+(e): the GDS projection is the edge DataFrame; PageRank
    * via the shared iterative operator (`graft.operators.GraphOps`). */
  def pageRankPlayers(faced: DataFrame, limit: Int = 20): DataFrame =
    graft.operators.GraphOps.pageRank(faced.select("src", "dst"))
      .orderBy(col("rank").desc, col("node"))
      .limit(limit)
}
