package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar / array / string / JSON function coverage (SURVEY.md §2.B rows
  * "Scalar fns" and "Array/map/json fns" — the surface the reference's
  * ClickBench and types/ sqllogictests exercise), plus the Structured
  * Streaming entries (stream results checked against batch SQL oracles).
  */
object FuncQueries {
  import Tables.t

  val defs: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(

    ("arr_explode_stats", (s: SparkSession, dir: String) => {
      t(s, dir, "embeddings")
        .select(col("label"), explode(col("embedding")).as("e"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(avg(abs(col("e"))), 4).as("avg_abs"),
          round(max(col("e")).cast("double"), 6).as("max_e"),
          round(min(col("e")).cast("double"), 6).as("min_e"))
        .orderBy("label")
    }, """
      SELECT label, count(*) AS n,
        round(avg(abs(e)), 4) AS avg_abs,
        round(CAST(max(e) AS DOUBLE), 6) AS max_e,
        round(CAST(min(e) AS DOUBLE), 6) AS min_e
      FROM (SELECT label, unnest(embedding) AS e FROM embeddings)
      GROUP BY label ORDER BY label
    """),

    ("arr_vector_funcs", (s: SparkSession, dir: String) => {
      val v = col("embedding")
      t(s, dir, "embeddings")
        .filter(col("vec_id") < 50)
        .select(col("vec_id"),
          size(v).as("dim"),
          round(graft.ops.Similarity.norm(v), 4).as("l2_norm"),
          round(element_at(v, 1).cast("double"), 6).as("first"),
          round(array_max(v).cast("double"), 6).as("maxv"),
          size(filter(v, x => x > 0)).as("n_positive"),
          round(aggregate(slice(v, 1, 8), lit(0.0), (a, x) => a + x.cast("double")), 4)
            .as("head_sum"))
        .orderBy("vec_id")
    }, """
      SELECT vec_id,
        CAST(len(embedding) AS INT) AS dim,
        round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
        round(CAST(embedding[1] AS DOUBLE), 6) AS first,
        round(CAST(list_max(embedding) AS DOUBLE), 6) AS maxv,
        CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
        round(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 4) AS head_sum
      FROM embeddings WHERE vec_id < 50
      ORDER BY vec_id
    """),

    ("str_funcs", (s: SparkSession, dir: String) => {
      t(s, dir, "documents")
        .filter(col("text").like("%the%"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          min(substring(col("text"), 1, 12)).as("min_prefix"),
          max(upper(substring(col("text"), 1, 6))).as("max_upper_prefix"),
          round(avg(length(regexp_replace(col("text"), "[aeiou]", ""))), 4)
            .as("avg_novowel_len"),
          countDistinct(regexp_extract(col("text"), "^(\\S+)", 1)).as("n_first_words"))
        .orderBy("source")
    }, """
      SELECT source, count(*) AS n,
        min(substr(text, 1, 12)) AS min_prefix,
        max(upper(substr(text, 1, 6))) AS max_upper_prefix,
        round(avg(length(regexp_replace(text, '[aeiou]', '', 'g'))), 4) AS avg_novowel_len,
        count(DISTINCT regexp_extract(text, '^(\S+)', 1)) AS n_first_words
      FROM documents
      WHERE text LIKE '%the%'
      GROUP BY source ORDER BY source
    """),

    ("skew_salted_join", (s: SparkSession, dir: String) => {
      // salted join must equal the plain join (oracle = plain SQL join);
      // events.user_id vs a small user dimension derived from customers
      val e = t(s, dir, "events")
      val users = t(s, dir, "customer")
        .select((col("c_custkey") % 50).as("user_id"), col("c_mktsegment"))
        .distinct()
      graft.ops.Skew.saltedJoin(e, users, "user_id", col("event_id"), salts = 8)
        .groupBy("c_mktsegment", "event_type")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("c_mktsegment", "event_type")
    }, """
      SELECT c_mktsegment, event_type, count(*) AS n,
        round(sum(value), 2) AS sum_value
      FROM events
      JOIN (SELECT DISTINCT c_custkey % 50 AS user_id, c_mktsegment FROM customer) u
        ON events.user_id = u.user_id
      GROUP BY 1, 2 ORDER BY 1, 2
    """),

    ("map_funcs", (s: SparkSession, dir: String) => {
      // map surface (SURVEY §2.B "map_*"): from_json->map, map_keys,
      // map_values, element_at, map construction + map_concat. The lake
      // itself rejects map COLUMNS (reference parity types.rs:74-85);
      // the delegated engine surface still answers map expressions.
      import org.apache.spark.sql.types.{IntegerType, MapType, StringType}
      t(s, dir, "events")
        .filter(col("event_id") % 37 === 0)
        .select(col("event_id"),
          from_json(col("props"), MapType(StringType, IntegerType)).as("m"))
        .select(col("event_id"),
          array_join(map_keys(col("m")), ",").as("m_keys"),
          element_at(col("m"), "k").as("k_val"),
          size(map_values(col("m"))).as("n_vals"),
          element_at(map_concat(col("m"), map(lit("z"), lit(-1))), "z").as("z_val"))
        .orderBy("event_id")
    }, """
      SELECT event_id,
        array_to_string(json_keys(props), ',') AS m_keys,
        CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        CAST(len(json_keys(props)) AS INT) AS n_vals,
        -1 AS z_val
      FROM events
      WHERE event_id % 37 = 0
      ORDER BY event_id
    """),

    ("stream_hourly_counts", (s: SparkSession, dir: String) => {
      graft.streaming.EventStream.hourlyCounts(s, dir)
    }, """
      SELECT date_trunc('hour', ts) AS hour, event_type,
        count(*) AS n, round(sum(value), 2) AS sum_value
      FROM events
      GROUP BY 1, 2 ORDER BY 1, 2
    """),

    ("stream_user_sessions", (s: SparkSession, dir: String) => {
      graft.streaming.EventStream.userSessions(s, dir)
    }, """
      SELECT user_id,
        count(*) AS n_events,
        CAST(sum(new_session) AS BIGINT) AS n_sessions
      FROM (
        SELECT user_id,
          CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        FROM (
          SELECT user_id, epoch_us(ts) AS ts_us,
            lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
          FROM events))
      GROUP BY user_id
      ORDER BY user_id
    """)
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (n, f, _) => n -> f }.toMap

  val oracle: Map[String, String] =
    defs.filter(_._3 != null)
      .map { case (n, _, o) => n -> o.stripMargin.trim.replaceAll("\\s+", " ") }.toMap
}
