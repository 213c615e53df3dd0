package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

import graft.QueryDef
import graft.QueryDef.sql
import graft.sources.Tables._

/** Corpus-curation operators a production training-data pipeline runs
  * between ingest and tokenization: snapshot reconciliation, one-pass
  * data profiling, importance-weighted selection (DSIR-shaped), and
  * PII detection/redaction. Extension surface beyond the reference
  * (SURVEY.md §2.I "beyond-reference"): the reference's corpus is
  * static cricket JSON, but the same engine pointed at a 100 TB web
  * corpus needs exactly these four shapes.
  */
object CurationOps {

  /** md5-derived 60-bit hash — identical in Spark and DuckDB (the
    * TextOps recipe, `TextOps.scala:39`). */
  private def tokHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def toks(c: Column): Column = split(trim(c), " ")

  /** Snapshot diff — reconcile two corpus snapshots by content hash:
    * which documents were added, removed, changed, or untouched between
    * ingest runs. The scale shape is ONE full-outer sort-merge join on
    * the primary key comparing md5(content) — never a content-level
    * compare shuffle (hashes travel, text stays at the scan) — followed
    * by a tiny status rollup. At 100 TB both snapshots are key-sorted
    * parquet, so the join is the mergeable layout A4 already provides.
    *
    * The "old" snapshot is derived deterministically from the current
    * corpus (both engines build the identical table): doc_id % 11 == 3
    * missing from old (→ added), doc_id % 7 == 2 carries a stale text
    * revision (→ changed), and a shifted-id slice exists only in old
    * (→ removed); everything else is unchanged.
    */
  val q105SnapshotDiff: QueryDef = sql(
    "q105_snapshot_diff",
    """WITH old AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 7 = 2 THEN text || ' rev0' ELSE text END AS text
      |  FROM documents WHERE doc_id % 11 <> 3
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text
      |  FROM documents WHERE doc_id % 13 = 5),
      |j AS (
      |  SELECT coalesce(n.doc_id, o.doc_id) AS doc_id,
      |    CASE WHEN o.doc_id IS NULL THEN 'added'
      |         WHEN n.doc_id IS NULL THEN 'removed'
      |         WHEN md5(n.text) <> md5(o.text) THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM documents n FULL OUTER JOIN old o ON n.doc_id = o.doc_id)
      |SELECT status, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM j GROUP BY 1 ORDER BY 1""") { (s, d) =>
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    val old = docs.filter(col("doc_id") % 11 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 2, concat(col("text"), lit(" rev0")))
          .otherwise(col("text")).as("text"))
      .unionAll(docs.filter(col("doc_id") % 13 === 5)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    // hash at the scan so only (doc_id, 32-byte hash) reaches the join
    val newH = docs.select(col("doc_id"), md5(col("text")).as("h_new"))
    val oldH = old.select(col("doc_id"), md5(col("text")).as("h_old"))
    newH.join(oldH, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_new") =!= col("h_old"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).cast("long").as("id_sum"))
      .orderBy(col("status"))
  }

  /** One-pass data profiling — the audit every ingest runs before a
    * table is admitted: per column, null count, exact distinct count,
    * and min/max (numeric columns as doubles, timestamps as epoch-µs,
    * strings lexicographic). ONE aggregate over ONE scan computes every
    * column's stats together (Catalyst plans the multi-distinct via a
    * single Expand — ×5 rows map-side, still one shuffle), then a
    * 1-row→5-row stack unpivots on the driver-sized result. Never one
    * pass per column. At 100 TB exact distinct per column is the one
    * knob to revisit (swap `countDistinct` for `approx_count_distinct`
    * — q39 pins that sketch's error bound); min/max/null-count come
    * free from the same pass either way.
    */
  val q106DataProfile: QueryDef = sql(
    "q106_data_profile",
    """WITH p AS (
      |  SELECT 'l_quantity' AS col_name, count(*) - count(l_quantity) AS n_null,
      |    count(DISTINCT l_quantity) AS n_distinct,
      |    CAST(min(l_quantity) AS DOUBLE) AS min_num,
      |    CAST(max(l_quantity) AS DOUBLE) AS max_num,
      |    CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_extendedprice', count(*) - count(l_extendedprice),
      |    count(DISTINCT l_extendedprice),
      |    CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE),
      |    NULL, NULL
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_discount', count(*) - count(l_discount),
      |    count(DISTINCT l_discount),
      |    CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE),
      |    NULL, NULL
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_returnflag', count(*) - count(l_returnflag),
      |    count(DISTINCT l_returnflag), NULL, NULL,
      |    min(l_returnflag), max(l_returnflag)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_shipdate', count(*) - count(l_shipdate),
      |    count(DISTINCT l_shipdate),
      |    CAST(epoch_us(min(l_shipdate)) AS DOUBLE),
      |    CAST(epoch_us(max(l_shipdate)) AS DOUBLE),
      |    NULL, NULL
      |  FROM lineitem)
      |SELECT * FROM p ORDER BY col_name""") { (s, d) =>
    val li = lineitem(s, d)
    def numStats(c: String) = Seq(
      (count(lit(1)) - count(col(c))).as(s"${c}_nulls"),
      countDistinct(col(c)).as(s"${c}_nd"),
      min(col(c)).cast("double").as(s"${c}_min"),
      max(col(c)).cast("double").as(s"${c}_max"))
    val aggs =
      numStats("l_quantity") ++ numStats("l_extendedprice") ++
        numStats("l_discount") ++ Seq(
          (count(lit(1)) - count(col("l_returnflag"))).as("rf_nulls"),
          countDistinct(col("l_returnflag")).as("rf_nd"),
          min(col("l_returnflag")).as("rf_min"),
          max(col("l_returnflag")).as("rf_max"),
          (count(lit(1)) - count(col("l_shipdate"))).as("sd_nulls"),
          countDistinct(col("l_shipdate")).as("sd_nd"),
          // session tz pinned UTC, so the NTZ→LTZ hop is µs-exact
          unix_micros(min(col("l_shipdate")).cast("timestamp"))
            .cast("double").as("sd_min"),
          unix_micros(max(col("l_shipdate")).cast("timestamp"))
            .cast("double").as("sd_max"))
    li.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        """stack(5,
          |'l_quantity', l_quantity_nulls, l_quantity_nd, l_quantity_min,
          |  l_quantity_max, CAST(NULL AS STRING), CAST(NULL AS STRING),
          |'l_extendedprice', l_extendedprice_nulls, l_extendedprice_nd,
          |  l_extendedprice_min, l_extendedprice_max, CAST(NULL AS STRING),
          |  CAST(NULL AS STRING),
          |'l_discount', l_discount_nulls, l_discount_nd, l_discount_min,
          |  l_discount_max, CAST(NULL AS STRING), CAST(NULL AS STRING),
          |'l_returnflag', rf_nulls, rf_nd, CAST(NULL AS DOUBLE),
          |  CAST(NULL AS DOUBLE), rf_min, rf_max,
          |'l_shipdate', sd_nulls, sd_nd, sd_min, sd_max,
          |  CAST(NULL AS STRING), CAST(NULL AS STRING))
          |AS (col_name, n_null, n_distinct, min_num, max_num, min_str, max_str)
          |""".stripMargin)
      .orderBy(col("col_name"))
  }

  /** Hashed n-gram bucket count for the DSIR feature space. */
  private val DsirBuckets = 4096

  /** Importance-weighted data selection (the DSIR shape — Xie et al.
    * 2023, "Data Selection for Language Models via Importance
    * Resampling"): score every raw document by how much more likely its
    * hashed unigram features are under a TARGET distribution (here the
    * `lang = 'en'` slice) than under the RAW corpus distribution, and
    * keep the top-scoring documents. log w(doc) = Σ_tokens
    * [ln p_target(bucket) − ln p_raw(bucket)] with add-one smoothing
    * over `DsirBuckets` hashed-token buckets.
    *
    * Cross-engine exactness: each bucket's log-ratio is quantized ONCE
    * to integer nano-units (the q64 recipe — ln and floor agree between
    * engines), so the per-doc score is an order-independent long sum.
    *
    * Scale shape: the feature distributions are ONE corpus pass into a
    * `DsirBuckets`-row table (constant-size regardless of corpus), the
    * scoring pass is a broadcast probe + doc-keyed sum, and selection is
    * TakeOrderedAndProject — no corpus-wide sort. This is precisely why
    * DSIR hashes features: the importance model stays driver-sized at
    * any corpus scale.
    */
  val q107ImportanceWeights: QueryDef = sql(
    "q107_importance_weights",
    s"""WITH t AS (SELECT doc_id, lang,
      |    CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) % $DsirBuckets AS b
      |  FROM (SELECT doc_id, lang, unnest(string_split(trim(text), ' ')) AS tok
      |        FROM documents)),
      |raw AS (SELECT b, count(*) AS rc FROM t GROUP BY 1),
      |tgt AS (SELECT b, count(*) AS tc FROM t WHERE lang = 'en' GROUP BY 1),
      |tot AS (SELECT (SELECT CAST(sum(rc) AS BIGINT) FROM raw) AS rtot,
      |               (SELECT CAST(sum(tc) AS BIGINT) FROM tgt) AS ttot),
      |lam AS (SELECT raw.b,
      |    CAST(floor((ln((coalesce(tc, 0) + 1.0) / (ttot + $DsirBuckets))
      |              - ln((rc + 1.0) / (rtot + $DsirBuckets))) * 1000000000.0
      |         + 0.5) AS BIGINT) AS nano
      |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot),
      |sc AS (SELECT doc_id, CAST(sum(nano) AS BIGINT) AS w_nano,
      |         count(*) AS n_tok
      |       FROM t JOIN lam ON t.b = lam.b GROUP BY 1)
      |SELECT d.doc_id, d.lang, n_tok, w_nano,
      |  round(CAST(w_nano AS DOUBLE) / 1000000000.0, 6) AS log_w
      |FROM sc JOIN documents d ON d.doc_id = sc.doc_id
      |ORDER BY w_nano DESC, d.doc_id LIMIT 50""") { (s, d) =>
    val t = documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(toks(col("text"))).as("tok"))
      .select(col("doc_id"), col("lang"),
        pmod(tokHash(col("tok")), lit(DsirBuckets)).as("b"))
    val raw = t.groupBy(col("b")).agg(count(lit(1)).as("rc"))
    val tgt = t.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("tc"))
    val tot = raw.agg(sum(col("rc")).cast("long").as("rtot"))
      .crossJoin(tgt.agg(sum(col("tc")).cast("long").as("ttot")))
    val lam = raw.join(tgt, Seq("b"), "left").crossJoin(broadcast(tot))
      .select(col("b"),
        floor((log((coalesce(col("tc"), lit(0)) + 1.0) /
            (col("ttot") + DsirBuckets)) -
          log((col("rc") + 1.0) / (col("rtot") + DsirBuckets))) *
          1000000000.0 + 0.5).cast("long").as("nano"))
    t.join(broadcast(lam), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("nano")).cast("long").as("w_nano"),
        count(lit(1)).as("n_tok"))
      .join(documents(s, d).select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("n_tok"), col("w_nano"),
        round(col("w_nano").cast("double") / 1000000000.0, 6).as("log_w"))
      .orderBy(col("w_nano").desc, col("doc_id"))
      .limit(50)
  }

  // PII patterns — deliberately simple classes both Java regex (Spark)
  // and RE2 (DuckDB) interpret identically: no backrefs, no lookaround.
  private val EmailPat = "[A-Za-z0-9]+@[A-Za-z0-9.]+\\.[A-Za-z]+"
  private val Ipv4Pat = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  private val PhonePat = "\\d{3}-\\d{4}"

  /** PII scan + redaction audit — the compliance pass a corpus takes
    * before training: count email / IPv4 / phone-shaped spans per
    * document, redact them, and roll up per source with a checksum of
    * the redacted text (so the oracle verifies the REDACTION output,
    * not just the counts). Map-only over the corpus — regex matching
    * and redaction never shuffle text; only per-source counters and the
    * 60-bit redaction checksums reach the aggregation.
    *
    * The synthetic corpus carries no organic PII, so both engines first
    * derive the SAME "dirty" text (deterministic doc_id-keyed spans
    * appended) — the operator under test is the scan/redact pipeline,
    * exercised against known-positive and known-negative rows.
    */
  val q108PiiScan: QueryDef = sql(
    "q108_pii_scan",
    s"""WITH dirty AS (SELECT doc_id, source,
      |    text
      |      || CASE WHEN doc_id % 3 = 0
      |           THEN ' contact user' || doc_id || '@mail.example.com' ELSE '' END
      |      || CASE WHEN doc_id % 5 = 0
      |           THEN ' from 10.0.' || (doc_id % 256) || '.7' ELSE '' END
      |      || CASE WHEN doc_id % 7 = 0
      |           THEN ' tel 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
      |           ELSE '' END AS t
      |  FROM documents),
      |scan AS (SELECT doc_id, source,
      |    len(regexp_extract_all(t, '$EmailPat')) AS n_email,
      |    len(regexp_extract_all(t, '$Ipv4Pat')) AS n_ip,
      |    len(regexp_extract_all(t, '$PhonePat')) AS n_phone,
      |    CAST(concat('0x', substr(md5(
      |      regexp_replace(regexp_replace(regexp_replace(t,
      |        '$EmailPat', '<EMAIL>', 'g'),
      |        '$Ipv4Pat', '<IP>', 'g'),
      |        '$PhonePat', '<PHONE>', 'g')), 1, 15)) AS BIGINT)
      |      % 1000000007 AS rhash
      |  FROM dirty)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN n_email + n_ip + n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS docs_with_pii,
      |  CAST(sum(n_email) AS BIGINT) AS emails,
      |  CAST(sum(n_ip) AS BIGINT) AS ips,
      |  CAST(sum(n_phone) AS BIGINT) AS phones,
      |  CAST(sum(rhash) AS BIGINT) AS redact_sum
      |FROM scan GROUP BY 1 ORDER BY 1""") { (s, d) =>
    val dirty = documents(s, d).select(col("doc_id"), col("source"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com"))).otherwise(""),
        when(col("doc_id") % 5 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".7"))).otherwise(""),
        when(col("doc_id") % 7 === 0,
          concat(lit(" tel 555-01"),
            lpad((col("doc_id") % 100).cast("string"), 2, "0")))
          .otherwise("")).as("t"))
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(col("t"), lit(EmailPat), lit("<EMAIL>")),
        lit(Ipv4Pat), lit("<IP>")),
      lit(PhonePat), lit("<PHONE>"))
    dirty.select(col("doc_id"), col("source"),
      regexp_count(col("t"), lit(EmailPat)).as("n_email"),
      regexp_count(col("t"), lit(Ipv4Pat)).as("n_ip"),
      regexp_count(col("t"), lit(PhonePat)).as("n_phone"),
      pmod(tokHash(redacted), lit(1000000007L)).as("rhash"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_email") + col("n_ip") + col("n_phone") > 0, 1)
          .otherwise(0)).cast("long").as("docs_with_pii"),
        sum(col("n_email")).cast("long").as("emails"),
        sum(col("n_ip")).cast("long").as("ips"),
        sum(col("n_phone")).cast("long").as("phones"),
        sum(col("rhash")).cast("long").as("redact_sum"))
      .orderBy(col("source"))
  }

  def all: Seq[QueryDef] =
    Seq(q105SnapshotDiff, q106DataProfile, q107ImportanceWeights, q108PiiScan)
}
