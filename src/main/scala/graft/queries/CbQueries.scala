package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ClickBench-shaped gates: the reference asserts the full ClickBench
  * suite against its lake (tests/sqllogictests/sql/clickbench/
  * clickbench.test_slow:1-250 — canonical hits-table answers). The hits
  * dataset isn't available offline, so each QUERY SHAPE is ported onto
  * the driver's `events`/`documents` tables and oracle-gated instead:
  * string-heavy group-bys, LIKE filters, regexp extraction,
  * high-cardinality COUNT DISTINCT, top-k by computed keys, wide
  * aggregate lists, and LIMIT/OFFSET subselect reductions.
  *
  * Oracle-parity conventions follow [[Tpch]]: identical aliases both
  * sides, doubles rounded identically, total deterministic ORDER BY
  * (every LIMIT has full tiebreakers so both engines pick the same
  * top-k), DuckDB sum(int) cast to BIGINT.
  *
  * 100 TB shape notes: every query here is a single hash-aggregate
  * exchange (plus a second for the distinct-aggregate rewrites) over a
  * pruned scan — the LIMIT/OFFSET reductions aggregate top-k results,
  * never raw rows, and the regexp/LIKE work happens map-side in the
  * scan stage before any shuffle.
  */
object CbQueries {
  import Tables.t

  val defs: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(

    // q01 shape: filtered COUNT(*)
    ("cb_count_filter", (s: SparkSession, dir: String) => {
      t(s, dir, "events").filter(col("value") > 10)
        .agg(count(lit(1)).as("n"))
    }, """
      SELECT count(*) AS n FROM events WHERE value > 10
    """),

    // q02 shape: global SUM / COUNT / AVG in one pass
    ("cb_sum_count_avg", (s: SparkSession, dir: String) => {
      t(s, dir, "events").agg(
        round(sum(col("value")), 2).as("sum_v"),
        count(lit(1)).as("n"),
        round(avg(col("value")), 4).as("avg_v"))
    }, """
      SELECT round(sum(value), 2) AS sum_v, count(*) AS n,
        round(avg(value), 4) AS avg_v
      FROM events
    """),

    // q04/q05 shape: high-cardinality exact COUNT DISTINCT
    ("cb_count_distinct", (s: SparkSession, dir: String) => {
      t(s, dir, "events").agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("props")).as("n_props"))
    }, """
      SELECT count(DISTINCT user_id) AS n_users,
        count(DISTINCT props) AS n_props
      FROM events
    """),

    // q06 shape: MIN/MAX over the time column
    ("cb_minmax_ts", (s: SparkSession, dir: String) => {
      t(s, dir, "events").agg(
        min(col("ts")).cast("timestamp_ntz").as("ts_min"),
        max(col("ts")).cast("timestamp_ntz").as("ts_max"))
    }, """
      SELECT min(ts) AS ts_min, max(ts) AS ts_max FROM events
    """),

    // q07 shape: group-by + ORDER BY COUNT DESC
    ("cb_group_topk", (s: SparkSession, dir: String) => {
      t(s, dir, "events").filter(col("value") > 0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("event_type"))
    }, """
      SELECT event_type, count(*) AS c FROM events
      WHERE value > 0
      GROUP BY event_type ORDER BY c DESC, event_type
    """),

    // q08/q13 shape: per-key COUNT DISTINCT users, top-10
    ("cb_group_cd_topk", (s: SparkSession, dir: String) => {
      t(s, dir, "events").filter(col("props") =!= "")
        .groupBy(col("props"))
        .agg(countDistinct(col("user_id")).as("u"))
        .orderBy(col("u").desc, col("props"))
        .limit(10)
    }, """
      SELECT props, count(DISTINCT user_id) AS u FROM events
      WHERE props <> ''
      GROUP BY props ORDER BY u DESC, props LIMIT 10
    """),

    // q09 shape: one group-by computing SUM + COUNT + AVG + COUNT
    // DISTINCT together (mixed distinct/non-distinct aggregate rewrite)
    ("cb_multi_agg", (s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(round(sum(col("value")), 2).as("sum_v"),
          count(lit(1)).as("c"),
          round(avg(col("value")), 4).as("avg_v"),
          countDistinct(col("props")).as("n_props"))
        .orderBy(col("c").desc, col("user_id"))
        .limit(10)
    }, """
      SELECT user_id, round(sum(value), 2) AS sum_v, count(*) AS c,
        round(avg(value), 4) AS avg_v, count(DISTINCT props) AS n_props
      FROM events
      GROUP BY user_id ORDER BY c DESC, user_id LIMIT 10
    """),

    // q14/q16 shape: two-key group top-10 with a NULLIF computed key
    ("cb_two_key_group", (s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .groupBy(col("user_id"),
          nullif(col("event_type"), lit("view")).as("et"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("user_id"), col("et").asc_nulls_first)
        .limit(10)
    }, """
      SELECT user_id, nullif(event_type, 'view') AS et, count(*) AS c
      FROM events
      GROUP BY user_id, nullif(event_type, 'view')
      ORDER BY c DESC, user_id, et NULLS FIRST LIMIT 10
    """),

    // q18/q42 shape: group by a computed time key, paged with OFFSET
    ("cb_minute_group", (s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .groupBy(date_trunc("minute", col("ts")).cast("timestamp_ntz").as("m"))
        .agg(count(lit(1)).as("pv"))
        .orderBy(col("m"))
        .offset(100).limit(10)
    }, """
      SELECT date_trunc('minute', ts) AS m, count(*) AS pv
      FROM events
      GROUP BY 1 ORDER BY m LIMIT 10 OFFSET 100
    """),

    // q20 shape: LIKE-filtered COUNT over a long text column
    ("cb_like_count", (s: SparkSession, dir: String) => {
      t(s, dir, "documents").filter(col("text").like("%table%"))
        .agg(count(lit(1)).as("n"))
    }, """
      SELECT count(*) AS n FROM documents WHERE text LIKE '%table%'
    """),

    // q21/q22 shape: LIKE filter + group with MIN(string) and COUNT
    ("cb_like_group", (s: SparkSession, dir: String) => {
      t(s, dir, "documents")
        .filter(col("text").like("%join%") && col("source") =!= "")
        .groupBy(col("lang"))
        .agg(min(col("source")).as("min_src"),
          count(lit(1)).as("c"),
          countDistinct(col("source")).as("n_src"))
        .orderBy(col("c").desc, col("lang"))
        .limit(10)
    }, """
      SELECT lang, min(source) AS min_src, count(*) AS c,
        count(DISTINCT source) AS n_src
      FROM documents
      WHERE text LIKE '%join%' AND source <> ''
      GROUP BY lang ORDER BY c DESC, lang LIMIT 10
    """),

    // q27 shape: AVG(STRLEN) per key with HAVING count threshold
    ("cb_strlen_having", (s: SparkSession, dir: String) => {
      t(s, dir, "documents").filter(col("text") =!= "")
        .groupBy(col("source"))
        .agg(round(avg(length(col("text"))), 2).as("l"),
          count(lit(1)).as("c"))
        .filter(col("c") > 15)
        .orderBy(col("l").desc, col("source"))
        .limit(25)
    }, """
      SELECT source, round(avg(length(text)), 2) AS l, count(*) AS c
      FROM documents
      WHERE text <> ''
      GROUP BY source HAVING count(*) > 15
      ORDER BY l DESC, source LIMIT 25
    """),

    // q28 shape: regexp key extraction + AVG(STRLEN)/COUNT/MIN per key
    ("cb_regexp_group", (s: SparkSession, dir: String) => {
      t(s, dir, "documents").filter(col("text") =!= "")
        .groupBy(regexp_extract(col("text"), "^([a-z]+)", 1).as("k"))
        .agg(round(avg(length(col("text"))), 2).as("l"),
          count(lit(1)).as("c"),
          min(col("source")).as("min_src"))
        .filter(col("c") > 20)
        .orderBy(col("l").desc, col("k"))
        .limit(25)
    }, """
      SELECT regexp_extract(text, '^([a-z]+)', 1) AS k,
        round(avg(length(text)), 2) AS l, count(*) AS c,
        min(source) AS min_src
      FROM documents
      WHERE text <> ''
      GROUP BY 1 HAVING count(*) > 20
      ORDER BY l DESC, k LIMIT 25
    """),

    // q29 shape: a wide list of arithmetic aggregates in one pass
    ("cb_many_sums", (s: SparkSession, dir: String) => {
      val aggs = (0 until 30).map(i =>
        round(sum(col("value") + lit(i)), 2).as(s"s$i"))
      t(s, dir, "events").agg(aggs.head, aggs.tail: _*)
    }, {
      val cols = (0 until 30)
        .map(i => s"round(sum(value + $i), 2) AS s$i").mkString(", ")
      s"SELECT $cols FROM events"
    }),

    // q30/q31 shape: two-key group, top-k, then MIN/MAX/COUNT reduction
    ("cb_topk_reduce", (s: SparkSession, dir: String) => {
      val top = t(s, dir, "events").filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("props"))
        .agg(count(lit(1)).as("c"),
          round(sum(col("value")), 2).as("sum_v"))
        .orderBy(col("c").desc, col("user_id"), col("props"))
        .limit(10)
      top.agg(min(col("c")).as("mn"), max(col("c")).as("mx"),
        count(lit(1)).as("n"))
    }, """
      SELECT min(c) AS mn, max(c) AS mx, count(*) AS n FROM (
        SELECT user_id, props, count(*) AS c, round(sum(value), 2) AS sum_v
        FROM events
        WHERE event_type = 'click'
        GROUP BY user_id, props
        ORDER BY c DESC, user_id, props LIMIT 10)
    """),

    // q22 shape: LIKE + NOT LIKE combined predicates feeding a group
    ("cb_not_like", (s: SparkSession, dir: String) => {
      t(s, dir, "documents")
        .filter(col("text").like("%table%") && !col("text").like("%merge%") &&
          col("lang") =!= "")
        .groupBy(col("lang"))
        .agg(min(col("source")).as("min_src"), count(lit(1)).as("c"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("c").desc, col("lang"))
        .limit(10)
    }, """
      SELECT lang, min(source) AS min_src, count(*) AS c,
        count(DISTINCT doc_id) AS n_docs
      FROM documents
      WHERE text LIKE '%table%' AND text NOT LIKE '%merge%' AND lang <> ''
      GROUP BY lang ORDER BY c DESC, lang LIMIT 10
    """),

    // q39 shape: a CASE-computed column as one of the group keys
    ("cb_case_group_key", (s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .groupBy(col("event_type"),
          when(col("value") < 5, "low")
            .when(col("value") < 20, "mid")
            .otherwise("high").as("band"))
        .agg(count(lit(1)).as("pv"),
          round(sum(col("value")), 2).as("sum_v"))
        .orderBy(col("pv").desc, col("event_type"), col("band"))
        .limit(15)
    }, """
      SELECT event_type,
        CASE WHEN value < 5 THEN 'low'
             WHEN value < 20 THEN 'mid'
             ELSE 'high' END AS band,
        count(*) AS pv, round(sum(value), 2) AS sum_v
      FROM events
      GROUP BY 1, 2 ORDER BY pv DESC, event_type, band LIMIT 15
    """),

    // q19 shape: point lookup on a high-cardinality key
    ("cb_point_lookup", (s: SparkSession, dir: String) => {
      t(s, dir, "events").filter(col("event_id") === 4242L)
        .select(col("event_id"), col("user_id"), col("event_type"))
    }, """
      SELECT event_id, user_id, event_type FROM events WHERE event_id = 4242
    """),

    // q25 shape: filtered projection, string sort, top-k
    ("cb_order_limit", (s: SparkSession, dir: String) => {
      t(s, dir, "documents").filter(col("lang") =!= "")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("lang"), col("doc_id"))
        .limit(10)
    }, """
      SELECT doc_id, lang FROM documents WHERE lang <> ''
      ORDER BY lang, doc_id LIMIT 10
    """),

    // q26 shape: top-k ordered by a column NOT in the projection
    ("cb_sort_by_time", (s: SparkSession, dir: String) => {
      t(s, dir, "events").filter(col("event_type") =!= "")
        .orderBy(col("ts"), col("event_id"))
        .select(col("event_id"), col("event_type"))
        .limit(10)
    }, """
      SELECT event_id, event_type FROM (
        SELECT event_id, event_type, ts FROM events WHERE event_type <> ''
        ORDER BY ts, event_id LIMIT 10)
      ORDER BY ts, event_id
    """),

    // q17 shape: group -> top-k page -> regroup -> COUNT reduction
    // (the literal ClickBench query pages an unordered LIMIT; a
    // deterministic ORDER BY keeps both engines on the same page)
    ("cb_nested_group_limit", (s: SparkSession, dir: String) => {
      val inner = t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("user_id"), col("event_type"))
        .limit(10)
      inner.select("user_id", "event_type").distinct()
        .agg(count(lit(1)).as("n"))
    }, """
      SELECT count(*) AS n FROM (
        SELECT DISTINCT user_id, event_type FROM (
          SELECT user_id, event_type, count(*) AS c FROM events
          GROUP BY user_id, event_type
          ORDER BY c DESC, user_id, event_type LIMIT 10))
    """),

    // q35 shape: several arithmetic expressions of one column as group keys
    ("cb_expr_group_keys", (s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .groupBy(col("user_id").as("u"),
          (col("user_id") - 1).as("u1"), (col("user_id") - 2).as("u2"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("u"))
        .limit(10)
    }, """
      SELECT user_id AS u, user_id - 1 AS u1, user_id - 2 AS u2,
        count(*) AS c
      FROM events
      GROUP BY 1, 2, 3 ORDER BY c DESC, u LIMIT 10
    """),

    // q38/q41 shape: top-k page with OFFSET feeding a reduction
    ("cb_offset_reduce", (s: SparkSession, dir: String) => {
      val page = t(s, dir, "events").filter(col("value") > 0)
        .groupBy(col("props"))
        .agg(count(lit(1)).as("pv"))
        .orderBy(col("pv").desc, col("props"))
        .offset(50).limit(10)
      page.agg(min(col("pv")).as("mn"), max(col("pv")).as("mx"),
        count(lit(1)).as("n"))
    }, """
      SELECT min(pv) AS mn, max(pv) AS mx, count(*) AS n FROM (
        SELECT props, count(*) AS pv FROM events
        WHERE value > 0
        GROUP BY props ORDER BY pv DESC, props LIMIT 10 OFFSET 50)
    """),

    // q36 shape: GROUP BY ALL (the DuckDB-originated syntax the
    // reference suite leans on) — every non-aggregate select item
    // becomes a group key, here one plain column and one computed
    // bucket, topped and reduced. SQL-only surface: the DataFrame API
    // has no GROUP BY ALL, so this goes through the parser on both
    // engines.
    ("cb_group_by_all", (s: SparkSession, dir: String) => {
      t(s, dir, "events").createOrReplaceTempView("__cb_ev_gba")
      s.sql("""
        SELECT min(pv) AS min_pv, max(pv) AS max_pv, count(*) AS n
        FROM (SELECT event_type, user_id % 100 AS ub, count(*) AS pv
              FROM __cb_ev_gba WHERE value > 5
              GROUP BY ALL ORDER BY pv DESC, event_type, ub LIMIT 50)""")
    }, """
      SELECT min(pv) AS min_pv, max(pv) AS max_pv,
             CAST(count(*) AS BIGINT) AS n
      FROM (SELECT event_type, user_id % 100 AS ub, count(*) AS pv
            FROM events WHERE value > 5
            GROUP BY ALL ORDER BY pv DESC, event_type, ub LIMIT 50)
    """)
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (n, f, _) => n -> f }.toMap

  val oracle: Map[String, String] =
    defs.map { case (n, _, o) => n -> o.stripMargin.trim.replaceAll("\\s+", " ") }.toMap
}
