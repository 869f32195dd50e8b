package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / grouping-set / set-operation / event-stream queries — the rest
  * of the delegated operator surface from SURVEY.md §2.B (windows, rollup,
  * intersect/except, json scalar functions, sessionization). Oracle-parity
  * conventions are the same as [[Tpch]].
  */
object Analytics {
  import Tables.t

  val defs: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(

    ("w_nation_revenue_rank", (s: SparkSession, dir: String) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= "1997-01-01" && col("o_orderdate") < "1998-01-01")
      val l = t(s, dir, "lineitem")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      val base = c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      val w = Window.partitionBy("r_name").orderBy(col("revenue").desc, col("n_name"))
      base
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("rn", row_number().over(w))
        .orderBy("r_name", "rn")
    }, """
      SELECT r_name, n_name, revenue,
        rank()       OVER (PARTITION BY r_name ORDER BY revenue DESC, n_name) AS rnk,
        dense_rank() OVER (PARTITION BY r_name ORDER BY revenue DESC, n_name) AS drnk,
        row_number() OVER (PARTITION BY r_name ORDER BY revenue DESC, n_name) AS rn
      FROM (
        SELECT r_name, n_name,
          round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY r_name, n_name)
      ORDER BY r_name, rn
    """),

    ("w_running_monthly_revenue", (s: SparkSession, dir: String) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      // timestamp_ntz: DuckDB's date_trunc is timezone-naive; the cast
      // makes the written parquet schema independent of any session-level
      // outputTimestampType a co-resident writer may have set
      val monthly = o.join(c, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month"))
        .agg(round(sum(col("o_totalprice")), 2).as("monthly_rev"))
      val w = Window.partitionBy("c_mktsegment").orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthly
        .withColumn("running_rev", round(sum(col("monthly_rev")).over(w), 2))
        .orderBy("c_mktsegment", "month")
    }, """
      SELECT c_mktsegment, month, monthly_rev,
        round(sum(monthly_rev) OVER (PARTITION BY c_mktsegment ORDER BY month
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
      FROM (
        SELECT c_mktsegment, date_trunc('month', o_orderdate) AS month,
          round(sum(o_totalprice), 2) AS monthly_rev
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        GROUP BY 1, 2)
      ORDER BY c_mktsegment, month
    """),

    ("w_mom_growth", (s: SparkSession, dir: String) => {
      val o = t(s, dir, "orders")
      val monthly = o
        .groupBy(date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month"))
        .agg(round(sum(col("o_totalprice")), 2).as("rev"))
      // global window is safe here: its input is the per-month aggregate,
      // O(calendar months) rows regardless of data scale — the heavy
      // groupBy above it shuffles normally
      val w = Window.orderBy("month")
      monthly
        .withColumn("prev_rev", lag(col("rev"), 1).over(w))
        .withColumn("growth", round(col("rev") - col("prev_rev"), 2))
        .orderBy("month")
    }, """
      SELECT month, rev,
        lag(rev, 1) OVER (ORDER BY month) AS prev_rev,
        round(rev - lag(rev, 1) OVER (ORDER BY month), 2) AS growth
      FROM (
        SELECT date_trunc('month', o_orderdate) AS month,
          round(sum(o_totalprice), 2) AS rev
        FROM orders GROUP BY 1)
      ORDER BY month
    """),

    ("rollup_sales", (s: SparkSession, dir: String) => {
      val o = t(s, dir, "orders")
      o.select(year(col("o_orderdate")).as("yr"), quarter(col("o_orderdate")).as("qtr"),
          col("o_totalprice"))
        .rollup("yr", "qtr")
        .agg(round(sum(col("o_totalprice")), 2).as("total"),
          count(lit(1)).as("n_orders"),
          grouping(col("yr")).cast("int").as("g_yr"),
          grouping(col("qtr")).cast("int").as("g_qtr"))
        .orderBy(col("g_yr"), col("g_qtr"), col("yr").asc_nulls_first,
          col("qtr").asc_nulls_first)
    }, """
      SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(quarter(o_orderdate) AS INT) AS qtr,
        round(sum(o_totalprice), 2) AS total,
        count(*) AS n_orders,
        CAST(grouping(year(o_orderdate)) AS INT) AS g_yr,
        CAST(grouping(quarter(o_orderdate)) AS INT) AS g_qtr
      FROM orders
      GROUP BY ROLLUP(year(o_orderdate), quarter(o_orderdate))
      ORDER BY g_yr, g_qtr, yr NULLS FIRST, qtr NULLS FIRST
    """),

    ("w_moving_avg", (s: SparkSession, dir: String) => {
      // sliding ROWS frame + lead + first_value over the monthly series
      val o = t(s, dir, "orders")
      val monthly = o
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(round(sum(col("o_totalprice")), 2).as("rev"))
      val w = Window.orderBy("month")
      monthly
        .withColumn("ma3", round(avg(col("rev"))
          .over(w.rowsBetween(-2, Window.currentRow)), 2))
        .withColumn("next_rev", lead(col("rev"), 1).over(w))
        .withColumn("first_rev", first(col("rev"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("month")
    }, """
      SELECT month, rev,
        round(avg(rev) OVER (ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS ma3,
        lead(rev, 1) OVER (ORDER BY month) AS next_rev,
        first_value(rev) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_rev
      FROM (
        SELECT date_trunc('month', o_orderdate) AS month,
          round(sum(o_totalprice), 2) AS rev
        FROM orders GROUP BY 1)
      ORDER BY month
    """),

    ("gsets_custom", (s: SparkSession, dir: String) => {
      // arbitrary GROUPING SETS (neither rollup nor cube): totals per
      // (status), per (priority), and the grand total — the TPC-DS-style
      // surface rollup/cube alone don't exercise
      t(s, dir, "orders").createOrReplaceTempView("gs_orders")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 2) AS total, count(*) AS n,
               CAST(grouping(o_orderstatus) AS INT) AS g_st,
               CAST(grouping(o_orderpriority) AS INT) AS g_pr
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_st, g_pr, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
    }, """
      SELECT o_orderstatus, o_orderpriority,
             round(sum(o_totalprice), 2) AS total, count(*) AS n,
             CAST(grouping(o_orderstatus) AS INT) AS g_st,
             CAST(grouping(o_orderpriority) AS INT) AS g_pr
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY g_st, g_pr, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """),

    ("cube_priority_status", (s: SparkSession, dir: String) => {
      val o = t(s, dir, "orders")
      o.cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(avg(col("o_totalprice")), 4).as("avg_price"),
          grouping(col("o_orderstatus")).cast("int").as("g_st"),
          grouping(col("o_orderpriority")).cast("int").as("g_pr"))
        .orderBy(col("g_st"), col("g_pr"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }, """
      SELECT o_orderstatus, o_orderpriority,
        count(*) AS n,
        round(avg(o_totalprice), 4) AS avg_price,
        CAST(grouping(o_orderstatus) AS INT) AS g_st,
        CAST(grouping(o_orderpriority) AS INT) AS g_pr
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY g_st, g_pr, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """),

    ("setop_customer_cohorts", (s: SparkSession, dir: String) => {
      val o = t(s, dir, "orders")
      def custsIn(yr: Int): DataFrame = o
        .filter(year(col("o_orderdate")) === yr)
        .select(col("o_custkey")).distinct()
      val both = custsIn(1996).intersect(custsIn(1997))
        .agg(count(lit(1)).as("n")).withColumn("cohort", lit("both"))
      val only96 = custsIn(1996).except(custsIn(1997))
        .agg(count(lit(1)).as("n")).withColumn("cohort", lit("only_1996"))
      val only97 = custsIn(1997).except(custsIn(1996))
        .agg(count(lit(1)).as("n")).withColumn("cohort", lit("only_1997"))
      both.union(only96).union(only97).select("cohort", "n").orderBy("cohort")
    }, """
      WITH c96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
           c97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
      SELECT 'both' AS cohort, count(*) AS n FROM (SELECT * FROM c96 INTERSECT SELECT * FROM c97)
      UNION ALL
      SELECT 'only_1996', count(*) FROM (SELECT * FROM c96 EXCEPT SELECT * FROM c97)
      UNION ALL
      SELECT 'only_1997', count(*) FROM (SELECT * FROM c97 EXCEPT SELECT * FROM c96)
      ORDER BY cohort
    """),

    ("ev_hourly_rollup", (s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"),
          round(avg(col("value")), 4).as("avg_value"))
        .orderBy("hour", "event_type")
    }, """
      SELECT date_trunc('hour', ts) AS hour, event_type,
        count(*) AS n,
        round(sum(value), 2) AS sum_value,
        round(avg(value), 4) AS avg_value
      FROM events
      GROUP BY 1, 2
      ORDER BY 1, 2
    """),

    ("ev_json_buckets", (s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy((col("k") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("bucket")
    }, """
      SELECT k % 10 AS bucket, count(*) AS n, min(k) AS min_k, max(k) AS max_k
      FROM (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
      GROUP BY 1
      ORDER BY 1
    """),

    ("ev_user_sessions", (s: SparkSession, dir: String) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      e.withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            col("ts_us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }, """
      SELECT user_id,
        CAST(sum(new_session) AS BIGINT) AS n_sessions,
        count(*) AS n_events
      FROM (
        SELECT user_id, event_id,
          CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        FROM (
          SELECT user_id, event_id, epoch_us(ts) AS ts_us,
            lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
          FROM events))
      GROUP BY user_id
      ORDER BY user_id
    """),

    ("ev_top_users_by_type", (s: SparkSession, dir: String) => {
      val e = t(s, dir, "events")
      val perUser = e.groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      val w = Window.partitionBy("event_type")
        .orderBy(col("n").desc, col("total_value").desc, col("user_id"))
      perUser.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("event_type", "user_id", "n", "total_value", "rn")
        .orderBy("event_type", "rn")
    }, """
      SELECT event_type, user_id, n, total_value, rn
      FROM (
        SELECT event_type, user_id, n, total_value,
          row_number() OVER (PARTITION BY event_type
            ORDER BY n DESC, total_value DESC, user_id) AS rn
        FROM (
          SELECT event_type, user_id, count(*) AS n,
            round(sum(value), 2) AS total_value
          FROM events GROUP BY 1, 2))
      WHERE rn <= 3
      ORDER BY event_type, rn
    """),

    ("join_full_outer", (s: SparkSession, dir: String) => {
      // FULL OUTER equi join: nations vs the set of nations that actually
      // have customers with open orders — both null sides exercised
      val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val activity = t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_nationkey").as("k"))
        .agg(count(lit(1)).as("open_orders"))
        // shift half the keys out of range so one side has true orphans
        .withColumn("k", when(col("k") % 2 === 1, col("k") + 100).otherwise(col("k")))
      n.join(activity, col("n_nationkey") === col("k"), "full_outer")
        .select(
          coalesce(col("n_nationkey"), lit(-1)).as("nation_key"),
          coalesce(col("n_name"), lit("<none>")).as("n_name"),
          coalesce(col("k"), lit(-1)).as("activity_key"),
          coalesce(col("open_orders"), lit(0L)).as("open_orders"))
        .orderBy("nation_key", "activity_key")
    }, """
      WITH activity AS (
        SELECT CASE WHEN c_nationkey % 2 = 1 THEN c_nationkey + 100
                    ELSE c_nationkey END AS k,
               count(*) AS open_orders
        FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE o_orderstatus = 'O'
        GROUP BY 1)
      SELECT coalesce(n_nationkey, -1) AS nation_key,
             coalesce(n_name, '<none>') AS n_name,
             CAST(coalesce(k, -1) AS INT) AS activity_key,
             CAST(coalesce(open_orders, 0) AS BIGINT) AS open_orders
      FROM nation FULL OUTER JOIN activity ON n_nationkey = k
      ORDER BY nation_key, activity_key
    """),

    ("setop_all_variants", (s: SparkSession, dir: String) => {
      // EXCEPT ALL / INTERSECT ALL: multiset semantics (duplicates carry
      // multiplicity), vs the DISTINCT set ops covered elsewhere.
      // (r17 note, deliberately NOT taken: because the payload is one
      // key column, the whole result is derivable in ONE lineitem pass —
      // per-key conditional counts n_a/n_b, then min(n_a,n_b) /
      // greatest(n_a−n_b,0) over keys with n_a>0 — 1 scan + 1 narrow
      // exchange vs the current 4 scans + 40 MB exchange (StageAudit
      // 10×: 2.7 s wall). Rewriting would optimize away the INTERSECT
      // ALL / EXCEPT ALL operators this gate exists to exercise; the
      // count-arithmetic shape is the production recommendation when
      // the set ops themselves are not the point.)
      val a = t(s, dir, "lineitem").filter(col("l_quantity") <= 10)
        .select(col("l_suppkey"))
      val b = t(s, dir, "lineitem").filter(col("l_discount") > 0.05)
        .select(col("l_suppkey"))
      val ia = a.intersectAll(b).groupBy("l_suppkey").agg(count(lit(1)).as("n_intersect"))
      val ea = a.exceptAll(b).groupBy("l_suppkey").agg(count(lit(1)).as("n_except"))
      ia.join(ea, Seq("l_suppkey"), "full_outer")
        .select(col("l_suppkey"),
          coalesce(col("n_intersect"), lit(0L)).as("n_intersect"),
          coalesce(col("n_except"), lit(0L)).as("n_except"))
        .orderBy("l_suppkey")
    }, """
      WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_quantity <= 10),
           b AS (SELECT l_suppkey FROM lineitem WHERE l_discount > 0.05),
           ia AS (SELECT l_suppkey, count(*) AS n_intersect
                  FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1),
           ea AS (SELECT l_suppkey, count(*) AS n_except
                  FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1)
      SELECT coalesce(ia.l_suppkey, ea.l_suppkey) AS l_suppkey,
             CAST(coalesce(n_intersect, 0) AS BIGINT) AS n_intersect,
             CAST(coalesce(n_except, 0) AS BIGINT) AS n_except
      FROM ia FULL OUTER JOIN ea ON ia.l_suppkey = ea.l_suppkey
      ORDER BY l_suppkey
    """),

    ("sql_lateral_topk", (s: SparkSession, dir: String) => {
      // correlated LATERAL subquery: top-2 orders per region — Catalyst
      // decorrelates into a ranked join (DecorrelateInnerQuery)
      Seq("region", "nation", "customer", "orders").foreach { tn =>
        t(s, dir, tn).createOrReplaceTempView(s"lat_$tn")
      }
      s.sql("""
        SELECT r.r_name, l.o_orderkey, l.o_totalprice
        FROM lat_region r,
        LATERAL (
          SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
          FROM lat_orders o
          JOIN lat_customer c ON o.o_custkey = c.c_custkey
          JOIN lat_nation n ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          ORDER BY o.o_totalprice DESC, o_orderkey
          LIMIT 2) l
        ORDER BY r.r_name, l.o_totalprice DESC, l.o_orderkey""")
    }, """
      SELECT r.r_name, l.o_orderkey, l.o_totalprice
      FROM region r,
      LATERAL (
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        ORDER BY o.o_totalprice DESC, o_orderkey
        LIMIT 2) l
      ORDER BY r.r_name, l.o_totalprice DESC, l.o_orderkey
    """),

    ("w_range_frame", (s: SparkSession, dir: String) => {
      // value-based RANGE frame (distinct from ROWS when days are
      // missing): 7-day trailing revenue over the daily series, ordered
      // by epoch-day distance so the frame is calendar-correct
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderdate").as("d"))
        .agg(round(sum("o_totalprice"), 2).as("rev"))
        .withColumn("dd", datediff(col("d"), lit("1970-01-01")))
      val w = org.apache.spark.sql.expressions.Window.orderBy("dd")
        .rangeBetween(-6, org.apache.spark.sql.expressions.Window.currentRow)
      daily.withColumn("rev7", round(sum("rev").over(w), 2))
        .select("d", "rev", "rev7")
        .orderBy("d")
        .limit(200)
    }, """
      SELECT d, rev,
        round(sum(rev) OVER (ORDER BY dd RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev7
      FROM (
        SELECT o_orderdate AS d, round(sum(o_totalprice), 2) AS rev,
          date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dd
        FROM orders GROUP BY o_orderdate)
      ORDER BY d LIMIT 200
    """),

    ("agg_filter_clause", (s: SparkSession, dir: String) => {
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          expr("count(*) FILTER (WHERE l_discount > 0.05)").as("n_disc"),
          expr("round(sum(l_extendedprice) FILTER (WHERE l_quantity > 30), 2)")
            .as("rev_bulk"),
          expr("round(avg(l_extendedprice) FILTER (WHERE l_tax = 0), 2)")
            .as("avg_untaxed"))
        .orderBy("l_returnflag")
    }, """
      SELECT l_returnflag, count(*) AS n,
        CAST(count(*) FILTER (l_discount > 0.05) AS BIGINT) AS n_disc,
        round(sum(l_extendedprice) FILTER (l_quantity > 30), 2) AS rev_bulk,
        round(avg(l_extendedprice) FILTER (l_tax = 0), 2) AS avg_untaxed
      FROM lineitem GROUP BY 1 ORDER BY 1
    """),

    // ---------------------------------------------------------------
    // TPC-DS-shaped plan diversity (the reference benches 99 TPC-DS
    // queries — benchmark/src/tpcds.rs; these reproduce the heaviest
    // plan SHAPES over the available tables: multi-CTE full-outer
    // cumulative comparison (q51), year-over-year channel ratio (q75),
    // and multi-window per-group quartile screening (q17/q51 hybrid)
    // ---------------------------------------------------------------

    ("ds_cumulative_compare", (s: SparkSession, dir: String) => {
      // TPC-DS q51 shape: two channel CTEs (high- vs low-priority
      // revenue) by month, FULL OUTER JOIN on the spine, running sums
      // over each side, filter where one cumulative overtakes the other
      val o = t(s, dir, "orders")
      val hi = o.filter(col("o_orderpriority") <= "2-HIGH")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month"))
        .agg(round(sum("o_totalprice"), 2).as("hi_rev"))
      val lo = o.filter(col("o_orderpriority") > "2-HIGH")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month"))
        .agg(round(sum("o_totalprice"), 2).as("lo_rev"))
      val joined = hi.join(lo, Seq("month"), "full_outer")
      val w = Window.orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      joined
        .withColumn("cum_hi", round(sum(coalesce(col("hi_rev"), lit(0.0))).over(w), 2))
        .withColumn("cum_lo", round(sum(coalesce(col("lo_rev"), lit(0.0))).over(w), 2))
        .filter(col("cum_lo") > col("cum_hi"))
        .select("month", "cum_hi", "cum_lo")
        .orderBy("month")
    }, """
      WITH hi AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               round(sum(o_totalprice), 2) AS hi_rev
        FROM orders WHERE o_orderpriority <= '2-HIGH' GROUP BY 1),
      lo AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               round(sum(o_totalprice), 2) AS lo_rev
        FROM orders WHERE o_orderpriority > '2-HIGH' GROUP BY 1)
      SELECT month, cum_hi, cum_lo FROM (
        SELECT COALESCE(hi.month, lo.month) AS month,
          round(sum(COALESCE(hi_rev, 0)) OVER (ORDER BY COALESCE(hi.month, lo.month)
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_hi,
          round(sum(COALESCE(lo_rev, 0)) OVER (ORDER BY COALESCE(hi.month, lo.month)
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_lo
        FROM hi FULL OUTER JOIN lo ON hi.month = lo.month)
      WHERE cum_lo > cum_hi
      ORDER BY month
    """),

    ("ds_yoy_growth", (s: SparkSession, dir: String) => {
      // TPC-DS q75 shape: yearly revenue per segment self-joined on the
      // previous year, reporting the growth ratio for shrinking segments
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val yearly = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"),
          year(col("o_orderdate")).as("yr"))
        .agg(round(sum("o_totalprice"), 2).as("rev"))
      val cur = yearly.select(col("segment"), col("yr"), col("rev").as("cur_rev"))
      val prev = yearly.select(col("segment"), (col("yr") + 1).as("yr"),
        col("rev").as("prev_rev"))
      cur.join(prev, Seq("segment", "yr"))
        .withColumn("ratio", round(col("cur_rev") / col("prev_rev") + 1e-9, 4))
        .filter(col("ratio") < 1.0)
        .select("segment", "yr", "cur_rev", "prev_rev", "ratio")
        .orderBy("segment", "yr")
    }, """
      WITH yearly AS (
        SELECT c_mktsegment AS segment, year(o_orderdate) AS yr,
               round(sum(o_totalprice), 2) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2)
      SELECT cur.segment, cur.yr, cur.rev AS cur_rev, prev.rev AS prev_rev,
             round(cur.rev / prev.rev + 1e-9, 4) AS ratio
      FROM yearly cur
      JOIN yearly prev ON cur.segment = prev.segment AND cur.yr = prev.yr + 1
      WHERE round(cur.rev / prev.rev + 1e-9, 4) < 1.0
      ORDER BY cur.segment, cur.yr
    """),

    ("ds_quartile_screen", (s: SparkSession, dir: String) => {
      // TPC-DS q17/q51 hybrid: per-segment customer revenue ranked into
      // quartiles with three windows, keeping each segment's top quartile
      // and reporting its share of the segment total
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val perCust = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("c_custkey"))
        .agg(round(sum("o_totalprice"), 2).as("rev"))
      val wq = Window.partitionBy("segment").orderBy(col("rev").desc, col("c_custkey"))
      val ws = Window.partitionBy("segment")
      perCust
        .withColumn("quartile", ntile(4).over(wq))
        .withColumn("seg_total", sum("rev").over(ws))
        .filter(col("quartile") === 1)
        .groupBy("segment")
        .agg(count(lit(1)).as("n_top"),
          round(sum("rev"), 2).as("top_rev"),
          round((sum("rev") / first("seg_total")) * 100 + 1e-9, 2).as("share_pct"))
        .orderBy("segment")
    }, """
      WITH per_cust AS (
        SELECT c_mktsegment AS segment, c_custkey,
               round(sum(o_totalprice), 2) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
      ranked AS (
        SELECT segment, rev,
          ntile(4) OVER (PARTITION BY segment ORDER BY rev DESC, c_custkey) AS quartile,
          sum(rev) OVER (PARTITION BY segment) AS seg_total
        FROM per_cust)
      SELECT segment, count(*) AS n_top, round(sum(rev), 2) AS top_rev,
             round(sum(rev) / any_value(seg_total) * 100 + 1e-9, 2) AS share_pct
      FROM ranked WHERE quartile = 1
      GROUP BY segment ORDER BY segment
    """),

    ("ds_channel_rollup", (s: SparkSession, dir: String) => {
      // TPC-DS q5/q77 shape: a UNION ALL of two revenue channels (order
      // headers vs returned line items) feeding one ROLLUP — partial
      // aggregation must survive the union and the grouping-sets expand
      // each branch reads its OWN scans — shared parents across a union
      // trip the self-join ambiguity check
      val orders = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .select(lit("order").as("channel"), col("n_name").as("grp"),
          col("o_totalprice").as("amt"))
      val returns = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .select(lit("return").as("channel"), col("n_name").as("grp"),
          col("l_extendedprice").as("amt"))
      orders.unionAll(returns).toDF("channel", "grp", "amt")
        .createOrReplaceTempView("__ds_sales")
      s.sql("""SELECT channel, grp, round(sum(amt), 2) AS rev,
          count(*) AS n_rows
        FROM __ds_sales GROUP BY ROLLUP(channel, grp)
        ORDER BY channel ASC NULLS FIRST, grp ASC NULLS FIRST""")
    }, """
      WITH sales AS (
        SELECT 'order' AS channel, n_name AS grp, o_totalprice AS amt
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        UNION ALL
        SELECT 'return' AS channel, n_name AS grp, l_extendedprice AS amt
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R')
      SELECT channel, grp, round(sum(amt), 2) AS rev, count(*) AS n_rows
      FROM sales GROUP BY ROLLUP(channel, grp)
      ORDER BY channel NULLS FIRST, grp NULLS FIRST
    """),

    ("ds_monthly_deviation", (s: SparkSession, dir: String) => {
      // TPC-DS q47 shape: per-segment monthly revenue with the segment
      // average, previous and next month in one window stack; report
      // months deviating >10% from their segment's average
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val m = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
          date_trunc("month", col("o_orderdate")).as("month"))
        .agg(round(sum("o_totalprice"), 2).as("rev"))
      val wSeg = Window.partitionBy("seg")
      val wOrd = Window.partitionBy("seg").orderBy("month")
      m.withColumn("seg_avg", round(avg("rev").over(wSeg), 2))
        .withColumn("prev_rev", lag("rev", 1).over(wOrd))
        .withColumn("next_rev", lead("rev", 1).over(wOrd))
        .filter(col("prev_rev").isNotNull && col("next_rev").isNotNull &&
          abs(col("rev") - col("seg_avg")) / col("seg_avg") > 0.1)
        .select("seg", "month", "rev", "seg_avg", "prev_rev", "next_rev")
        .orderBy("seg", "month")
    }, """
      WITH m AS (
        SELECT c_mktsegment AS seg, date_trunc('month', o_orderdate) AS month,
               round(sum(o_totalprice), 2) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
      w AS (
        SELECT seg, month, rev,
          round(avg(rev) OVER (PARTITION BY seg), 2) AS seg_avg,
          lag(rev) OVER (PARTITION BY seg ORDER BY month) AS prev_rev,
          lead(rev) OVER (PARTITION BY seg ORDER BY month) AS next_rev
        FROM m)
      SELECT seg, month, rev, seg_avg, prev_rev, next_rev FROM w
      WHERE prev_rev IS NOT NULL AND next_rev IS NOT NULL
        AND abs(rev - seg_avg) / seg_avg > 0.1
      ORDER BY seg, month
    """),

    ("ds_cohort_setchain", (s: SparkSession, dir: String) => {
      // TPC-DS q87 shape: INTERSECT then EXCEPT over customer cohorts of
      // consecutive years, reduced to one exact count
      val o = t(s, dir, "orders")
      def cohort(yr: Int) = o.filter(year(col("o_orderdate")) === yr)
        .select(col("o_custkey")).distinct()
      cohort(1993).intersect(cohort(1994)).except(cohort(1995))
        .agg(count(lit(1)).as("n_lapsed"))
    }, """
      SELECT count(*) AS n_lapsed FROM (
        (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1993
         INTERSECT
         SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1994)
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995) t
    """),

    ("ds_crosschannel_items", (s: SparkSession, dir: String) => {
      // TPC-DS q14 shape: a cross_items CTE (parts sold through EVERY
      // channel — ship modes stand in for store/catalog/web) feeding a
      // union of per-channel aggregates restricted to those items. The
      // candidate set is one hash aggregate (count of distinct channels
      // per part), broadcast into each channel branch — at 100 TB the
      // branches scan in parallel and share the small semi-join side.
      val l = t(s, dir, "lineitem")
      val modes = Seq("A", "N", "R") // return-flag channels in the testdata
      val inChannels = l.filter(col("l_returnflag").isin(modes: _*))
      val crossItems = inChannels
        .groupBy(col("l_partkey"))
        .agg(countDistinct(col("l_returnflag")).as("__nch"))
        .filter(col("__nch") === modes.length)
        .select(col("l_partkey"))
      val perChannel = inChannels
        .join(broadcast(crossItems), Seq("l_partkey"), "left_semi")
        .groupBy(col("l_returnflag").as("channel"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
      perChannel.orderBy("channel")
    }, """
      WITH cross_items AS (
        SELECT l_partkey FROM lineitem
        WHERE l_returnflag IN ('A', 'N', 'R')
        GROUP BY l_partkey
        HAVING count(DISTINCT l_returnflag) = 3)
      SELECT l_returnflag AS channel, count(*) AS n_items,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      WHERE l_returnflag IN ('A', 'N', 'R')
        AND l_partkey IN (SELECT l_partkey FROM cross_items)
      GROUP BY 1 ORDER BY 1
    """),

    ("ds_quarter_share_shift", (s: SparkSession, dir: String) => {
      // TPC-DS q31 shape: per-(nation, quarter) aggregates as separate
      // CTE instances JOINED on the entity key (not a window lag), with
      // a cross-period ratio filter — exercises multi-aggregate join
      // reuse; every join side is an already-reduced aggregate
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val base = o.filter(year(col("o_orderdate")) === 1996)
        .join(c, col("c_custkey") === col("o_custkey"))
        .join(n, col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"), quarter(col("o_orderdate")).cast("int").as("qtr"))
        .agg(sum(col("o_totalprice")).as("rev"))
      val q1 = base.filter(col("qtr") === 1).select(col("n_name"), col("rev").as("rev_q1"))
      val q2 = base.filter(col("qtr") === 2).select(col("n_name"), col("rev").as("rev_q2"))
      val q3 = base.filter(col("qtr") === 3).select(col("n_name"), col("rev").as("rev_q3"))
      // q31's filter keeps nations whose growth decelerates; at test SFs
      // that can eliminate every nation (r6: 0 rows on both engines — a
      // vacuously-green gate). Emit ALL nations with a trend class
      // instead, so the join-reuse shape is identical but the gate
      // verifies real rows. Classification compares the ROUNDED ratios —
      // both engines round identically, so the boundary is stable.
      q1.join(q2, Seq("n_name")).join(q3, Seq("n_name"))
        .select(col("n_name"),
          round(col("rev_q1"), 2).as("rev_q1"),
          round(col("rev_q2") / col("rev_q1"), 4).as("g12"),
          round(col("rev_q3") / col("rev_q2"), 4).as("g23"))
        .withColumn("trend",
          when(col("g12") > col("g23"), "decelerating")
            .when(col("g12") < col("g23"), "accelerating")
            .otherwise("flat"))
        .orderBy("n_name")
    }, """
      WITH base AS (
        SELECT n_name, CAST(quarter(o_orderdate) AS INT) AS qtr,
          sum(o_totalprice) AS rev
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
        WHERE year(o_orderdate) = 1996
        GROUP BY 1, 2)
      SELECT n_name, rev_q1, g12, g23,
        CASE WHEN g12 > g23 THEN 'decelerating'
             WHEN g12 < g23 THEN 'accelerating'
             ELSE 'flat' END AS trend
      FROM (
        SELECT q1.n_name, round(q1.rev, 2) AS rev_q1,
          round(q2.rev / q1.rev, 4) AS g12,
          round(q3.rev / q2.rev, 4) AS g23
        FROM (SELECT n_name, rev FROM base WHERE qtr = 1) q1
        JOIN (SELECT n_name, rev FROM base WHERE qtr = 2) q2 ON q1.n_name = q2.n_name
        JOIN (SELECT n_name, rev FROM base WHERE qtr = 3) q3 ON q2.n_name = q3.n_name)
      ORDER BY n_name
    """),

    ("ds_multisupp_returns", (s: SparkSession, dir: String) => {
      // TPC-DS q95 shape (reference:
      // tests/sqllogictests — the web_sales "shipped from two warehouses
      // AND returned" reachability query): a self-joined CTE (orders
      // whose lineitems ship from ≥2 suppliers) consumed by TWO
      // IN/EXISTS chains — once directly against orders, once through a
      // second fact join (returned lineitems). The distinctive planning
      // class is the REUSED CTE feeding stacked left-semi joins; Spark
      // recomputes the CTE per reference, and both semi probes stay on
      // the shared l_orderkey shuffle key, so at 100 TB the chain is
      // three co-keyed exchanges, never a fact×fact blow-up. (The
      // production rewrite — groupBy(l_orderkey) HAVING
      // count(DISTINCT l_suppkey) ≥ 2 — avoids the self-join entirely;
      // the gate keeps q95's literal shape because the self-join +
      // semi-chain is the plan class under test.)
      val li = t(s, dir, "lineitem")
      val l1 = li.select(col("l_orderkey"), col("l_suppkey"))
      val multiSupp = l1.as("l1")
        .join(l1.select(col("l_orderkey").as("__ok2"), col("l_suppkey").as("__sk2")),
          col("l_orderkey") === col("__ok2") && col("l_suppkey") =!= col("__sk2"))
        .select(col("l_orderkey").as("ok")).distinct()
      val returned = li.filter(col("l_returnflag") === "R")
        .join(multiSupp, col("l_orderkey") === col("ok"), "left_semi")
        .select(col("l_orderkey").as("rk")).distinct()
      t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F" &&
          col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .join(multiSupp, col("o_orderkey") === col("ok"), "left_semi")
        .join(returned, col("o_orderkey") === col("rk"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_cnt"),
          round(sum("o_totalprice") + lit(1e-9), 2).as("total_price"))
        .orderBy("o_orderpriority")
    }, """
      WITH multi_supp AS (
        SELECT DISTINCT l1.l_orderkey AS ok
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey)
      SELECT o_orderpriority,
        CAST(count(*) AS BIGINT) AS order_cnt,
        round(sum(o_totalprice) + 1e-9, 2) AS total_price
      FROM orders o
      WHERE o_orderstatus = 'F'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND o_orderkey IN (SELECT ok FROM multi_supp)
        AND o_orderkey IN (
          SELECT l.l_orderkey FROM lineitem l
          JOIN multi_supp m ON l.l_orderkey = m.ok
          WHERE l.l_returnflag = 'R')
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """),

    ("ds_crossyear_basket", (s: SparkSession, dir: String) => {
      // TPC-DS q64 shape: one heavy multi-join aggregate CTE
      // (lineitem⨝orders⨝customer⨝nation⨝part⨝supplier — six tables)
      // instantiated TWICE (consecutive years) and self-joined on the
      // group keys with a cross-instance predicate. Exercises join
      // reordering across a 6-table chain and CTE reuse; at 100 TB every
      // dimension side broadcasts and the one fact shuffle is shared by
      // both instances via exchange reuse.
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val p = t(s, dir, "part")
      val su = t(s, dir, "supplier")
      def cs(yr: Int) = l
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .filter(year(col("o_orderdate")) === yr)
        .groupBy(col("p_brand"), col("n_name"))
        // +1e-9 on both engines: exact-.xx5 dyadic sums round differently
        // in Spark vs DuckDB (see verify skill notes)
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) + lit(1e-9), 2)
            .as("rev"))
      cs(1996).select(col("p_brand"), col("n_name"),
          col("cnt").as("cnt96"), col("rev").as("rev96"))
        .join(cs(1997).select(col("p_brand"), col("n_name"),
          col("cnt").as("cnt97"), col("rev").as("rev97")),
          Seq("p_brand", "n_name"))
        .filter(col("rev97") > col("rev96"))
        .orderBy("p_brand", "n_name")
    }, """
      WITH cs AS (
        SELECT p_brand, n_name, CAST(year(o_orderdate) AS INT) AS yr,
          count(*) AS cnt,
          round(sum(l_extendedprice * (1 - l_discount)) + 0.000000001, 2) AS rev
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE year(o_orderdate) IN (1996, 1997)
        GROUP BY 1, 2, 3)
      SELECT a.p_brand, a.n_name, a.cnt AS cnt96, a.rev AS rev96,
        b.cnt AS cnt97, b.rev AS rev97
      FROM (SELECT * FROM cs WHERE yr = 1996) a
      JOIN (SELECT * FROM cs WHERE yr = 1997) b
        ON a.p_brand = b.p_brand AND a.n_name = b.n_name
      WHERE b.rev > a.rev
      ORDER BY a.p_brand, a.n_name
    """),

    ("ds_revenue_histogram", (s: SparkSession, dir: String) => {
      // TPC-DS q54 shape: a customer cohort derived by INTERSECT (bought
      // in BOTH "channels" — order-priority classes stand in), joined
      // back to the fact table, per-customer revenue bucketed into a
      // histogram. Set-op -> semi-join -> re-aggregate -> bucket count:
      // the cohort is dimension-sized and broadcasts at scale.
      val o = t(s, dir, "orders")
      def buyers(prio: String) = o.filter(col("o_orderpriority") === prio)
        .select(col("o_custkey")).distinct()
      val cohort = buyers("1-URGENT").intersect(buyers("2-HIGH"))
      val spend = o.join(cohort, Seq("o_custkey"), "left_semi")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice")).as("rev"))
      spend
        .groupBy(floor(col("rev") / 50000).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("bucket")
    }, """
      WITH cohort AS (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'),
      spend AS (
        SELECT o_custkey, sum(o_totalprice) AS rev
        FROM orders
        WHERE o_custkey IN (SELECT o_custkey FROM cohort)
        GROUP BY o_custkey)
      SELECT CAST(floor(rev / 50000) AS INT) AS bucket, count(*) AS n_cust
      FROM spend GROUP BY 1 ORDER BY bucket
    """),

    ("ds_attr_exists_filter", (s: SparkSession, dir: String) => {
      // TPC-DS q41 shape: DISTINCT names of parts for which a correlated
      // EXISTS finds a sibling (same brand) satisfying a disjunction of
      // attribute conjunctions — the decorrelation-heavy filter pattern.
      // Expressed as a left-semi join on the correlation key with the
      // disjunction pushed into the sibling side (what Catalyst's
      // RewritePredicateSubquery produces from EXISTS).
      val p = t(s, dir, "part")
      val sib = p.filter(
        (col("p_type").contains("PROMO") && col("p_size").between(1, 15)) ||
          (col("p_type").contains("ECONOMY") && col("p_size").between(20, 40)))
        .select(col("p_brand").as("__b"))
      p.join(sib, col("p_brand") === col("__b"), "left_semi")
        .filter(col("p_retailprice") > 990)
        .select(col("p_name")).distinct()
        .orderBy("p_name").limit(50)
    }, """
      SELECT DISTINCT p_name FROM part p1
      WHERE p_retailprice > 990
        AND EXISTS (
          SELECT 1 FROM part p2 WHERE p2.p_brand = p1.p_brand
            AND ((p2.p_type LIKE '%PROMO%' AND p2.p_size BETWEEN 1 AND 15)
              OR (p2.p_type LIKE '%ECONOMY%' AND p2.p_size BETWEEN 20 AND 40)))
      ORDER BY p_name LIMIT 50
    """),

    ("ds_monthly_outliers", (s: SparkSession, dir: String) => {
      // TPC-DS q47 shape: per-entity monthly series with a CENTERED
      // moving average (1 preceding..1 following) and a rank filter —
      // windows stacked on an aggregate, partitioned by the entity so
      // the sort stays inside each nation's partition at scale
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val monthly = o.filter(year(col("o_orderdate")) === 1997)
        .join(c, col("c_custkey") === col("o_custkey"))
        .join(n, col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"),
          month(col("o_orderdate")).cast("int").as("mon"))
        .agg(round(sum(col("o_totalprice")) + lit(1e-9), 2).as("rev"))
      val wAvg = Window.partitionBy("n_name").orderBy("mon")
        .rowsBetween(-1, 1)
      val wRank = Window.partitionBy("n_name").orderBy(col("dev").desc, col("mon"))
      monthly
        .withColumn("ma3", round(avg(col("rev")).over(wAvg) + lit(1e-9), 2))
        .withColumn("dev", round(abs(col("rev") - col("ma3")), 2))
        .withColumn("rnk", rank().over(wRank).cast("int"))
        .filter(col("rnk") <= 2)
        .select("n_name", "mon", "rev", "ma3", "dev", "rnk")
        .orderBy("n_name", "rnk", "mon")
    }, """
      WITH monthly AS (
        SELECT n_name, CAST(month(o_orderdate) AS INT) AS mon,
          round(sum(o_totalprice) + 0.000000001, 2) AS rev
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
        WHERE year(o_orderdate) = 1997
        GROUP BY 1, 2),
      scored AS (
        SELECT n_name, mon, rev,
          round(avg(rev) OVER (PARTITION BY n_name ORDER BY mon
            ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) + 0.000000001, 2) AS ma3
        FROM monthly)
      SELECT n_name, mon, rev, ma3, dev, rnk FROM (
        SELECT n_name, mon, rev, ma3,
          round(abs(rev - ma3), 2) AS dev,
          CAST(rank() OVER (PARTITION BY n_name
            ORDER BY round(abs(rev - ma3), 2) DESC, mon) AS INT) AS rnk
        FROM scored)
      WHERE rnk <= 2
      ORDER BY n_name, rnk, mon
    """),

    ("ds_timeband_counts", (s: SparkSession, dir: String) => {
      // TPC-DS q88 shape: EIGHT independent filtered single-row
      // aggregates cross-joined into one row — the multi-subquery scan
      // pattern. Each band is its own aggregate over the shared events
      // scan; Catalyst reuses the exchange, and at 100 TB the eight
      // single-row sides are trivially broadcast.
      val ev = t(s, dir, "events")
      def band(h: Int) = ev
        .filter(hour(col("ts")) >= h && hour(col("ts")) < h + 3 &&
          col("event_type").isin("click", "view"))
        .agg(count(lit(1)).as(s"h$h"))
      Seq(0, 3, 6, 9, 12, 15, 18, 21).map(band).reduce(_ crossJoin _)
    }, {
      val subs = Seq(0, 3, 6, 9, 12, 15, 18, 21).map(h =>
        s"""(SELECT count(*) AS h$h FROM events
            WHERE hour(ts) >= $h AND hour(ts) < ${h + 3}
              AND event_type IN ('click', 'view')) b$h""")
        .mkString(", ")
      s"SELECT * FROM $subs"
    }),

    ("ds_rollup_ranked", (s: SparkSession, dir: String) => {
      // TPC-DS q67 shape: revenue rolled up over (segment, year), then a
      // rank() window OVER the rollup's own output, partitioned by
      // grouping level so detail rows, segment subtotals, and the grand
      // total each keep their own top-3. Window-over-grouping-sets is a
      // distinct plan class: an exchange on (gs, gy, seg) stacked on the
      // rollup's expand+aggregate — both partial-aggregated map-side, and
      // the window partitions are at most |segments| wide, never
      // data-sized.
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .createOrReplaceTempView("__ds_rr")
      s.sql("""
        WITH m AS (
          SELECT c_mktsegment AS seg, year(o_orderdate) AS yr,
                 grouping(c_mktsegment) AS gs,
                 grouping(year(o_orderdate)) AS gy,
                 round(sum(o_totalprice) + 1e-9, 2) AS rev
          FROM __ds_rr
          GROUP BY ROLLUP(c_mktsegment, year(o_orderdate))),
        w AS (
          SELECT seg, yr, rev,
                 rank() OVER (PARTITION BY gs, gy, seg ORDER BY rev DESC)
                   AS rk
          FROM m)
        SELECT seg, yr, rev, rk FROM w WHERE rk <= 3
        ORDER BY seg ASC NULLS FIRST, yr ASC NULLS FIRST, rk""")
    }, """
      WITH m AS (
        SELECT c_mktsegment AS seg, CAST(year(o_orderdate) AS INT) AS yr,
               grouping(c_mktsegment) AS gs,
               grouping(year(o_orderdate)) AS gy,
               round(sum(o_totalprice) + 1e-9, 2) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY ROLLUP(c_mktsegment, year(o_orderdate))),
      w AS (
        SELECT seg, yr, rev,
               CAST(rank() OVER (PARTITION BY gs, gy, seg ORDER BY rev DESC)
                 AS INT) AS rk
        FROM m)
      SELECT seg, yr, rev, rk FROM w WHERE rk <= 3
      ORDER BY seg NULLS FIRST, yr NULLS FIRST, rk
    """),

    ("ds_cumulative_crossover", (s: SparkSession, dir: String) => {
      // TPC-DS q51 shape: two channel aggregates (returned vs accepted
      // line items) FULL OUTER joined on (brand, week) — at sf0.01 ~1600
      // of 8484 cells are one-sided, so the outer semantics are really
      // exercised — then per-brand cumulative counts compared week by
      // week. The filter compares exact integers (counts, not floating
      // sums), so the gate can't flip on dyadic rounding. At 100 TB both
      // channel aggregates partial-aggregate map-side to (brand, week)
      // grain before the one shuffle each, and the window partitions are
      // per-brand week series, never data-sized.
      val base = t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      def chan(flag: String, alias: String) = base
        .filter(col("l_returnflag") === flag)
        .groupBy(col("p_brand").as("brand"),
          date_trunc("week", col("o_orderdate")).as("wk"))
        .agg(count(lit(1)).as(alias))
      val j = chan("A", "a_cnt")
        .join(chan("R", "r_cnt"), Seq("brand", "wk"), "full_outer")
      val w = Window.partitionBy("brand").orderBy("wk")
      j.withColumn("cum_a", sum(coalesce(col("a_cnt"), lit(0L))).over(w))
        .withColumn("cum_r", sum(coalesce(col("r_cnt"), lit(0L))).over(w))
        .filter(col("cum_a") > col("cum_r"))
        .select("brand", "wk", "cum_a", "cum_r")
        .orderBy("brand", "wk")
    }, """
      WITH a AS (
        SELECT p_brand AS brand, date_trunc('week', o_orderdate) AS wk,
               count(*) AS a_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'A' GROUP BY 1, 2),
      r AS (
        SELECT p_brand AS brand, date_trunc('week', o_orderdate) AS wk,
               count(*) AS r_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R' GROUP BY 1, 2),
      j AS (
        SELECT coalesce(a.brand, r.brand) AS brand,
               coalesce(a.wk, r.wk) AS wk,
               coalesce(a_cnt, 0) AS a_cnt, coalesce(r_cnt, 0) AS r_cnt
        FROM a FULL OUTER JOIN r ON a.brand = r.brand AND a.wk = r.wk),
      c AS (
        SELECT brand, wk,
          CAST(sum(a_cnt) OVER (PARTITION BY brand ORDER BY wk) AS BIGINT)
            AS cum_a,
          CAST(sum(r_cnt) OVER (PARTITION BY brand ORDER BY wk) AS BIGINT)
            AS cum_r
        FROM j)
      SELECT brand, wk, cum_a, cum_r FROM c WHERE cum_a > cum_r
      ORDER BY brand, wk
    """)
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (n, f, _) => n -> f }.toMap

  val oracle: Map[String, String] =
    defs.map { case (n, _, o) => n -> o.stripMargin.trim.replaceAll("\\s+", " ") }.toMap
}
